"""Occlusion-aware plane-sweep cost volume (DynamicDepth variant).

Re-design of `dynamicdepth/networks/resnet_encoder.py:148-249`
(`match_features` with `cv_min` / `cv_set_1` / `cv_pool`): after the DOMD
module blanks moved dynamic objects, occluded regions are black
(RGB sum < 0.15); their cost-volume entries are either set high (`set_1`),
infilled from neighbouring non-occluded costs via a 3-D max-pool (`pool`),
or the per-frame *min* replaces the mean (`cv_min`).

`set_1`/`cv_min` compose with the chunked scan; `pool` needs the full depth
axis, so it runs batch-item-mapped like the reference (but still vectorized
over frames/planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mal_tpu import geometry
from mal_tpu.ops.cost_volume import _border2_mask
from mal_tpu.ops.interp import grid_sample, resize_nearest

Array = jax.Array


def _occlusion_mask(lookup_images: Array, h: int, w: int) -> Array:
    """(B, F, H, W, 3) -> (B, F, h, w) occluded-black mask at matching res.

    Reference: `resnet_encoder.py:160` — RGB sum < 0.15, nearest resize.
    """
    B, F = lookup_images.shape[:2]
    occ = (jnp.sum(lookup_images, axis=-1, keepdims=True) < 0.15).astype(jnp.float32)
    occ = resize_nearest(occ.reshape((B * F,) + occ.shape[2:]), h, w)
    return occ.reshape(B, F, h, w)


@functools.partial(jax.jit, static_argnames=(
    "cv_min", "set_1", "pool", "pool_r", "chunk", "set_missing_to_max"))
def occlusion_aware_cost_volume(
    cur_feats: Array,      # (B, h, w, C)
    lookup_feats: Array,   # (B, F, h, w, C)
    rel_poses: Array,      # (B, F, 4, 4)
    K: Array, inv_K: Array,            # (B, 4, 4) at feature scale
    depth_bins: Array,                  # (D,)
    lookup_images: Array,  # (B, F, H, W, 3) full-res (post-DOMD)
    aug_mask: Array,       # (B,) 1 where matching was augmented
    cv_min: bool = False, set_1: bool = False, pool: bool = False,
    pool_r: int = 1, pool_th: float = 0.7,
    chunk: int = 16, set_missing_to_max: bool = True,
):
    """Returns (cost_volume, missing_mask), each (B, D, h, w)."""
    B, h, w, C = cur_feats.shape
    F = lookup_feats.shape[1]
    D = depth_bins.shape[0]
    dtype = cur_feats.dtype

    pix = geometry.pixel_grid(h, w, jnp.float32)
    P = (K[:, None] @ rel_poses)[:, :, :3, :]
    rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision="highest")
    A = jnp.einsum("bfij,bjn->bfin", P[:, :, :, :3], rays, precision="highest")
    t = P[:, :, :, 3]
    valid_frame = (jnp.sum(jnp.abs(rel_poses), axis=(-1, -2)) != 0)
    valid_frame = valid_frame.astype(dtype)[:, :, None, None, None]
    border = _border2_mask(h, w, dtype)
    scale = jnp.asarray([w - 1, h - 1], jnp.float32)

    occ = None
    if set_1 or pool:
        occ = _occlusion_mask(lookup_images, h, w)  # (B, F, h, w)
        apply_occ = (aug_mask == 0).astype(dtype)[:, None, None, None, None]

    lookup_flat = lookup_feats.reshape(B * F, h, w, C)

    def warp_plane_block(d_block):
        """d_block: (Dc,) -> (diffs (B,F,Dc,h,w))."""
        Dc = d_block.shape[0]
        d = d_block[None, None, :, None, None]
        cam = d * A[:, :, None] + t[:, :, None, :, None]
        xy = cam[:, :, :, :2, :] / (cam[:, :, :, 2:3, :] + 1e-7)
        xy = jnp.moveaxis(xy.reshape(B, F, Dc, 2, h, w), 3, -1)
        grid = (xy / scale - 0.5) * 2.0

        grid_bf = grid.reshape(B * F, Dc * h, w, 2)
        warped = grid_sample(lookup_flat, grid_bf, "zeros", True)
        warped = warped.reshape(B, F, Dc, h, w, C)

        if set_1 or pool:
            occ_bf = occ.reshape(B * F, h, w, 1)
            occ_w = grid_sample(occ_bf, grid_bf, "zeros", True)
            occ_w = occ_w.reshape(B, F, Dc, h, w)
            omask = (occ_w > pool_th)[..., None] & (apply_occ[..., None] > 0)
            if set_1:
                warped = jnp.where(omask, 1.0, warped)
            else:  # pool: zero now, infill after the block is assembled
                warped = jnp.where(omask, 0.0, warped)

        x_v = (grid[..., 0] / 2.0 + 0.5) * (w - 1)
        y_v = (grid[..., 1] / 2.0 + 0.5) * (h - 1)
        edge = ((x_v >= 2.0) & (x_v <= w - 2) & (y_v >= 2.0) & (y_v <= h - 2))
        edge = edge.astype(dtype) * border

        if pool:
            # 3-D max-pool infill over (D, h, w) per channel
            # (`resnet_encoder.py:198-202`) — needs the full depth axis.
            omask_full = (occ_w > pool_th)[..., None] & (apply_occ[..., None] > 0)
            x = jnp.where(omask_full, 0.0, warped)
            k = pool_r * 2 + 1
            # (B*F, C, D, h, w) for the 3-D window reduction
            xw = jnp.moveaxis(x, -1, 2).reshape(B * F, C, Dc, h, w)
            pooled = lax.reduce_window(
                xw, -jnp.inf, lax.max, (1, 1, k, k, k), (1, 1, 1, 1, 1),
                [(0, 0), (0, 0), (pool_r, pool_r), (pool_r, pool_r), (pool_r, pool_r)])
            pooled = jnp.moveaxis(pooled.reshape(B, F, C, Dc, h, w), 2, -1)
            warped = jnp.where(omask_full, pooled, warped)

        diffs = jnp.mean(jnp.abs(warped - cur_feats[:, None, None]), axis=-1)
        return diffs * edge * valid_frame

    if pool:
        diffs = warp_plane_block(depth_bins.astype(jnp.float32))  # full D
        if cv_min:
            diffs = jnp.where(diffs == 0, 1.0, diffs)
            diffs = jnp.where(valid_frame > 0, diffs, 1.0)
            # the reference's running `minimum(diffs, cost)` starts from a
            # ONES-initialized volume (`resnet_encoder.py:165-166,228`), so
            # any diff >= 1.0 saturates at the init value and is then
            # zeroed as "missing" by `cost_volume[cost_volume==1] = 0`
            # (`:233`) — min over frames alone is NOT equivalent
            cost = jnp.minimum(jnp.min(diffs, axis=1), 1.0)
            cost = jnp.where(cost == 1.0, 0.0, cost)
        else:
            cost = jnp.sum(diffs, axis=1)
            counts = jnp.sum((diffs > 0).astype(dtype), axis=1)
            cost = cost / (counts + 1e-7)
    else:
        assert D % chunk == 0

        def body(_, d_chunk):
            diffs = warp_plane_block(d_chunk)
            if cv_min:
                d2 = jnp.where(diffs == 0, 1.0, diffs)
                d2 = jnp.where(valid_frame > 0, d2, 1.0)
                # ones-init saturation, see the pool branch above
                c = jnp.minimum(jnp.min(d2, axis=1), 1.0)
                return None, (c, jnp.zeros_like(c))
            c = jnp.sum(diffs, axis=1)
            n = jnp.sum((diffs > 0).astype(dtype), axis=1)
            return None, (c, n)

        d_chunks = depth_bins.astype(jnp.float32).reshape(D // chunk, chunk)
        _, (cost, counts) = lax.scan(body, None, d_chunks)
        cost = jnp.moveaxis(cost, 0, 1).reshape(B, D, h, w)
        counts = jnp.moveaxis(counts, 0, 1).reshape(B, D, h, w)
        if cv_min:
            cost = jnp.where(cost == 1.0, 0.0, cost)
        else:
            cost = cost / (counts + 1e-7)

    missing = (cost == 0).astype(dtype)
    if set_missing_to_max:
        cost = cost * (1.0 - missing) + jnp.max(cost, axis=1, keepdims=True) * missing
    return cost, missing


def occlusion_aware_cost_volume_pallas(
    cur_feats: Array, lookup_feats: Array, rel_poses: Array,
    K: Array, inv_K: Array, depth_bins: Array,
    lookup_images: Array, aug_mask: Array,
    cv_min: bool = False, set_1: bool = False, pool_th: float = 0.7,
    set_missing_to_max: bool = True, mxu_precision: str = "highest",
    interpret: bool = False,
):
    """Pallas-kernel twin of `occlusion_aware_cost_volume` for the
    `set_1`/`cv_min` variants (the DynamicDepth defaults). The DOMD
    occlusion mask rides the plane-sweep interpolation matmuls as one
    extra feature channel (`ops/pallas/cost_volume_kernel.py:
    plane_sweep_diffs_occ_pallas`), replacing the chunked grid_sample
    formulation that dominated the step (~370 of 678 ms,
    benchmarks/bench_dynamic_decompose.py). `pool` keeps the XLA path
    (3-D max-pool infill needs the full depth axis).

    Returns (cost_volume, missing_mask), each (B, D, h, w) — same
    contract and quirks (ones-init saturation, missing-to-max) as the XLA
    twin, equivalence-tested in tests/test_dynamic_model.py.
    """
    B, h, w, C = cur_feats.shape
    F = lookup_feats.shape[1]
    D = depth_bins.shape[0]
    dtype = cur_feats.dtype

    from mal_tpu.ops.pallas.cost_volume_kernel import (
        plane_sweep_diffs_occ_pallas, plane_sweep_diffs_pallas)

    P = (K[:, None] @ rel_poses)[:, :, :3, :]
    M = jnp.einsum("bfij,bjk->bfik", P[:, :, :, :3], inv_K[:, :3, :3])
    t = P[:, :, :, 3]

    cur_rep = jnp.broadcast_to(cur_feats[:, None], lookup_feats.shape)
    if set_1:
        occ = _occlusion_mask(lookup_images, h, w)       # (B, F, h, w)
        apply_occ = jnp.broadcast_to(
            (aug_mask == 0).astype(jnp.float32)[:, None], (B, F))
        diffs = plane_sweep_diffs_occ_pallas(
            cur_rep.reshape(B * F, h, w, C),
            lookup_feats.reshape(B * F, h, w, C),
            occ.reshape(B * F, h, w), apply_occ.reshape(B * F),
            M.reshape(B * F, 3, 3), t.reshape(B * F, 3), depth_bins,
            pool_th=float(pool_th), interpret=interpret,
            mxu_precision=mxu_precision)
    else:
        diffs = plane_sweep_diffs_pallas(
            cur_rep.reshape(B * F, h, w, C),
            lookup_feats.reshape(B * F, h, w, C),
            M.reshape(B * F, 3, 3), t.reshape(B * F, 3), depth_bins,
            interpret=interpret, mxu_precision=mxu_precision)
    diffs = diffs.reshape(B, F, D, h, w).astype(dtype)

    valid_frame = (jnp.sum(jnp.abs(rel_poses), axis=(-1, -2)) != 0)
    valid_frame = valid_frame.astype(dtype)[:, :, None, None, None]
    diffs = diffs * valid_frame

    if cv_min:
        d2 = jnp.where(diffs == 0, 1.0, diffs)
        d2 = jnp.where(valid_frame > 0, d2, 1.0)
        # ones-init saturation quirk — see the XLA twin above
        cost = jnp.minimum(jnp.min(d2, axis=1), 1.0)
        cost = jnp.where(cost == 1.0, 0.0, cost)
    else:
        cost = jnp.sum(diffs, axis=1)
        counts = jnp.sum((diffs > 0).astype(dtype), axis=1)
        cost = cost / (counts + 1e-7)

    missing = (cost == 0).astype(dtype)
    if set_missing_to_max:
        cost = cost * (1.0 - missing) + jnp.max(
            cost, axis=1, keepdims=True) * missing
    return cost, missing
