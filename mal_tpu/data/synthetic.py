"""Synthetic batches for tests/benchmarks (KITTI-shaped)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.config import Config


def synthetic_batch(cfg: Config, rng: jax.Array, batch_size: int | None = None,
                    dtype=jnp.float32) -> dict:
    """A random batch in the canonical input format (see MALModel docstring)."""
    B = batch_size or cfg.batch_size
    H, W = cfg.height, cfg.width
    frames = cfg.frames_to_load
    keys = jax.random.split(rng, 2 * len(frames))

    color = {}
    color_aug = {}
    for i, f in enumerate(frames):
        color[str(f)] = jax.random.uniform(keys[2 * i], (B, H, W, 3), dtype)
        color_aug[str(f)] = jnp.clip(
            color[str(f)]
            + 0.02 * jax.random.normal(keys[2 * i + 1], (B, H, W, 3), dtype),
            0.0, 1.0)

    # KITTI normalized intrinsics (`manydepth/datasets/kitti_dataset.py`)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    K = jnp.asarray(np.broadcast_to(K, (B, 4, 4)).copy())

    return {
        "color": color,
        "color_aug": color_aug,
        "K": K,
        "inv_K": jnp.linalg.inv(K),
    }
