"""Epipolar cost sampler (DualRefine `CoordSampler`, `dualrefine/networks/corr.py`).

Functional: a pyramid of 2x-average-pooled target features is sampled at
hypothesis pixel coordinates (level-0 units, half-pixel normalized,
align_corners=False — RAFT convention), cost is the L1 difference to the
source feature map averaged over channels per head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from mal_tpu.ops.interp import grid_sample

Array = jax.Array


def avg_pool2(x: Array) -> Array:
    """2x2 stride-2 average pool, NHWC."""
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "VALID") / 4.0


def build_pyramid(fmap2: Array, num_levels: int) -> list[Array]:
    pyr = [fmap2]
    for _ in range(num_levels - 1):
        pyr.append(avg_pool2(pyr[-1]))
    return pyr


def _sample_level(feat: Array, coords: Array, h1: int, w1: int) -> Array:
    """feat: (B, hi, wi, C); coords: (B, h1*w1, D, 2) level-0 pixel coords.

    Normalization uses the level-0 dims (2*(x+0.5)/w1 - 1) — combined with
    align_corners=False this lands on the right sub-pixel position at every
    pyramid level (`corr.py:34-40`).
    """
    gx = 2.0 * (coords[..., 0] + 0.5) / w1 - 1.0
    gy = 2.0 * (coords[..., 1] + 0.5) / h1 - 1.0
    grid = jnp.stack([gx, gy], -1)  # (B, h1*w1, D, 2)
    return grid_sample(feat, grid, padding_mode="zeros", align_corners=False)


def epipolar_cost(fmap1: Array, f2_pyramid: list[Array], coords: Array,
                  num_levels: int, num_head: int = 1) -> Array:
    """fmap1: (B, h, w, C); coords: (B, 2, L, D, h, w) pixel coordinates.

    Returns (B, h, w, L*num_head*D) cost features (reference channel order:
    level-major, then head, then sample index; `corr.py:24-50`).
    """
    B, _, L, D, h, w = coords.shape
    C = fmap1.shape[-1]
    # Chunk the D sample axis: the packed-corner gather materializes
    # (B, h*w*dd, 4, C), so an unchunked call at production DualRefine
    # shapes (h*w=7680, D=2r+1=17, C=128) peaks at ~0.5 GB per level —
    # measured ~3 GiB of step transients at 192x640 (the reason the
    # reference-default config OOMed a 16 GB v5e). The per-chunk cost
    # reduces over C immediately, so only the (B, h*w, D, num_head)
    # costs survive chunking; numerics are unchanged (same gathers,
    # same reduction, different schedule).
    chunk_budget = 256 * 2 ** 20
    dd = max(1, min(D, chunk_budget // max(B * h * w * 4 * C * 4, 1)))
    f1 = fmap1.reshape(B, h * w, 1, num_head, C // num_head)
    out = []
    for lv in range(num_levels):
        c = coords[:, :, lv]  # (B, 2, D, h, w)
        c = jnp.moveaxis(c, 1, -1).reshape(B, D, h * w, 2)
        c = jnp.swapaxes(c, 1, 2)  # (B, h*w, D, 2)
        costs = []
        for d0 in range(0, D, dd):
            sampled = _sample_level(f2_pyramid[lv], c[:, :, d0:d0 + dd],
                                    h, w)             # (B, h*w, dd, C)
            diff = jnp.abs(f1 - sampled.reshape(
                B, h * w, -1, num_head, C // num_head))
            costs.append(diff.mean(-1))               # (B, h*w, dd, heads)
        diff = jnp.concatenate(costs, axis=2).reshape(B, h, w, D, num_head)
        # channel order (head, D) per level
        cost = jnp.swapaxes(diff, 3, 4).reshape(B, h, w, num_head * D)
        out.append(cost)
    return jnp.concatenate(out, axis=-1)


def epipolar_cost_simple(fmap1: Array, f2_pyramid: list[Array],
                         coords: Array, num_levels: int = 1) -> Array:
    """`CoordSampler.__corr__` — plain channel-mean cost (B, h, w, L*D)."""
    return epipolar_cost(fmap1, f2_pyramid, coords, num_levels, num_head=1)
