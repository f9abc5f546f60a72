"""Benchmark: MAL training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full jit-compiled ManyDepth+MAL training step (teacher + student
forward, cost volume, photometric warps, MAL distillation, Adam update) at the
reference configuration — 192x640, batch 12, 96 depth bins
(`manydepth/options.py:50-109`) — on synthetic data, steady state (compile
excluded).

`vs_baseline`: the reference publishes no numbers (BASELINE.md); we use an
estimated 50 frames/s A100 training throughput for the same model/batch as a
fixed comparison denominator until reference hardware numbers exist.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

ESTIMATED_REFERENCE_FPS = 50.0  # A100 estimate; see module docstring


def main():
    from mal_tpu.config import Config
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    cfg = Config(height=192, width=640, batch_size=12)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))

    epoch = jnp.zeros(())
    # warmup / compile; device_get forces execution even over remote-attached
    # devices (block_until_ready alone does not flush the axon tunnel)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), epoch)
    float(jax.device_get(metrics["loss"]))

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i), epoch)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n_iters

    final_loss = float(jax.device_get(metrics["loss"]))
    assert jnp.isfinite(final_loss), f"training diverged: loss={final_loss}"

    fps = cfg.batch_size / dt
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip_640x192",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / ESTIMATED_REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
