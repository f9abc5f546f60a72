"""Pallas TPU kernel for the plane-sweep cost volume.

The XLA formulation (`mal_tpu.ops.cost_volume`) is gather-bound: ~8.8M
bilinear samples of 64-channel feature vectors per step (~250 ms on v5e,
index-rate limited, no reuse). This kernel keeps the whole 1/4-res lookup
feature map in VMEM and converts the per-row bilinear warp into small
interpolation matmuls on the MXU:

  warped[c, u] = sum_r  T_r[c, :] @ W_r[:, u]

where T_r is source row r of the lookup features and W_r is a per-output-row
interpolation matrix built on the fly from iota comparisons — entries
wx0/wx1 at columns floor(x(u)) / +1, scaled by the y-corner weight of row r.
Rows r sweep a *dynamic* band [min floor(y), max floor(y)+1] computed per
(plane, output row), so the loop trip count matches the actual epipolar
geometry (2-4 rows for automotive ego-motion) instead of the full height.

Zeros-padding semantics fall out naturally: out-of-image corners match no
iota row/column and contribute 0 — exactly `grid_sample(padding_mode=zeros)`.
The kernel also applies the reference's border-2 edge masking
(`manydepth/networks/resnet_encoder.py:196-207`), so the output is the
per-frame masked L1 feature difference; frame averaging / counts / missing
fill stay in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _make_kernel(mxu_precision: str):
    prec = {"highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT}[mxu_precision]
    return functools.partial(_kernel, prec)


def _kernel(prec, dbins_ref, M_ref, t_ref, lookup_ref, cur_ref, out_ref):
    """Grid: (BF, D). Blocks:
    dbins (D,) SMEM; M (1, 3, 3) SMEM; t (1, 3) SMEM;
    lookup/cur (1, h, C, w) VMEM; out (1, 1, h, w) VMEM.
    """
    bi = pl.program_id(0)
    di = pl.program_id(1)
    d = dbins_ref[di]

    h = lookup_ref.shape[1]
    C = lookup_ref.shape[2]
    w = lookup_ref.shape[3]

    m00 = M_ref[bi, 0, 0]; m01 = M_ref[bi, 0, 1]; m02 = M_ref[bi, 0, 2]
    m10 = M_ref[bi, 1, 0]; m11 = M_ref[bi, 1, 1]; m12 = M_ref[bi, 1, 2]
    m20 = M_ref[bi, 2, 0]; m21 = M_ref[bi, 2, 1]; m22 = M_ref[bi, 2, 2]
    t0 = t_ref[bi, 0]; t1 = t_ref[bi, 1]; t2 = t_ref[bi, 2]

    u = lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    xin = lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(jnp.float32)

    def row_body(v, _):
        vf = v.astype(jnp.float32)
        xh = d * (m00 * u + m01 * vf + m02) + t0
        yh = d * (m10 * u + m11 * vf + m12) + t1
        zh = d * (m20 * u + m21 * vf + m22) + t2
        x = xh / (zh + 1e-7)
        y = yh / (zh + 1e-7)

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wx0 = 1.0 - wx1
        wy1 = y - y0
        wy0 = 1.0 - wy1

        # x interpolation matrix (w_in, w_out); OOB columns match nothing
        Wx = ((xin == x0) * wx0 + (xin == (x0 + 1.0)) * wx1)  # (w, w)

        # dynamic row band covering floor(y) and floor(y)+1
        rbase = jnp.min(y0).astype(jnp.int32)
        rtop = jnp.max(y0).astype(jnp.int32) + 1
        rbase_c = jnp.clip(rbase, -1, h)          # keep trip count sane
        rcount = jnp.clip(rtop - rbase_c + 1, 0, h + 2)

        def band_body(k, warped):
            r = rbase_c + k
            rf = r.astype(jnp.float32)
            in_img = (r >= 0) & (r < h)
            s_r = ((y0 == rf) * wy0 + ((y0 + 1.0) == rf) * wy1)  # (1, w)
            s_r = jnp.where(in_img, s_r, 0.0)
            rc = jnp.clip(r, 0, h - 1)
            T_r = lookup_ref[0, rc]                 # (C, w)
            W_r = Wx * s_r                          # scale columns
            return warped + jax.lax.dot_general(
                T_r, W_r, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32)

        warped = lax.fori_loop(
            0, rcount, band_body, jnp.zeros((C, w), jnp.float32))

        cur_row = cur_ref[0, v]                     # (C, w)
        diff = jnp.mean(jnp.abs(warped - cur_row), axis=0, keepdims=True)

        # edge masks (`resnet_encoder.py:196-207`)
        edge = ((x >= 2.0) & (x <= w - 2) & (y >= 2.0) & (y <= h - 2))
        inner = (u >= 2.0) & (u <= w - 3) & (vf >= 2.0) & (vf <= h - 3)
        diff = diff * (edge & inner).astype(jnp.float32)

        out_ref[0, 0, v] = diff[0]
        return 0

    lax.fori_loop(0, h, row_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "mxu_precision"))
def plane_sweep_diffs_pallas(cur_feats: Array, lookup_feats: Array,
                             M: Array, t: Array, depth_bins: Array,
                             interpret: bool = False,
                             mxu_precision: str = "highest") -> Array:
    """Per-frame masked L1 plane-sweep differences.

    cur_feats: (BF, h, w, C); lookup_feats: (BF, h, w, C);
    M: (BF, 3, 3) = (K @ T)[:3,:3] @ inv_K[:3,:3]; t: (BF, 3) = (K @ T)[:3,3];
    depth_bins: (D,). Returns (BF, D, h, w).
    """
    BF, h, w, C = cur_feats.shape
    D = depth_bins.shape[0]

    # (BF, h, C, w) so that a source row is a (C, w) MXU operand
    lookup_T = jnp.swapaxes(lookup_feats, 2, 3)
    cur_T = jnp.swapaxes(cur_feats, 2, 3)

    grid = (BF, D)
    return pl.pallas_call(
        _make_kernel(mxu_precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # depth bins (D,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # M (BF, 3, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t (BF, 3)
            pl.BlockSpec((1, h, C, w), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, C, w), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BF, D, h, w), jnp.float32),
        interpret=interpret,
    )(depth_bins.astype(jnp.float32), M, t, lookup_T, cur_T)


@functools.partial(jax.jit, static_argnames=("set_missing_to_max", "interpret",
                                              "mxu_precision"))
def plane_sweep_cost_volume_pallas(
    cur_feats: Array,      # (B, h, w, C)
    lookup_feats: Array,   # (B, F, h, w, C)
    rel_poses: Array,      # (B, F, 4, 4)
    K: Array, inv_K: Array,
    depth_bins: Array,
    set_missing_to_max: bool = True,
    interpret: bool = False,
    mxu_precision: str = "highest",
):
    """Drop-in replacement for `plane_sweep_cost_volume` (same outputs)."""
    B, h, w, C = cur_feats.shape
    F = lookup_feats.shape[1]
    D = depth_bins.shape[0]

    P = (K[:, None] @ rel_poses)[:, :, :3, :]              # (B, F, 3, 4)
    M = jnp.einsum("bfij,bjk->bfik", P[:, :, :, :3], inv_K[:, :3, :3])
    t = P[:, :, :, 3]

    cur_rep = jnp.broadcast_to(cur_feats[:, None], lookup_feats.shape)
    diffs = plane_sweep_diffs_pallas(
        cur_rep.reshape(B * F, h, w, C),
        lookup_feats.reshape(B * F, h, w, C),
        M.reshape(B * F, 3, 3), t.reshape(B * F, 3), depth_bins,
        interpret=interpret, mxu_precision=mxu_precision)
    diffs = diffs.reshape(B, F, D, h, w)

    valid = (jnp.sum(jnp.abs(rel_poses), axis=(-1, -2)) != 0)
    diffs = diffs * valid[:, :, None, None, None].astype(diffs.dtype)

    cost = jnp.sum(diffs, axis=1)
    counts = jnp.sum((diffs > 0).astype(diffs.dtype), axis=1)
    cost = cost / (counts + 1e-7)
    missing = (cost == 0).astype(cost.dtype)
    if set_missing_to_max:
        cost = cost * (1.0 - missing) + jnp.max(cost, 1, keepdims=True) * missing
    return cost, missing


# ---------------------------------------------------------------------------
# Occlusion-aware variant (DynamicDepth, `dynamicdepth/networks/
# resnet_encoder.py:148-249`): identical plane-sweep warp, plus the DOMD
# occlusion mask warped as ONE EXTRA FEATURE CHANNEL through the same
# interpolation matmuls (bilinear warp of a channel == the same W_r
# contraction, so the occluded-region test costs no extra pass), then the
# reference's `cv_set_1` substitution (occluded warped features := 1.0)
# before the per-frame L1 mean. Round-5 motivation: the XLA chunked
# grid_sample formulation of this volume measured ~370 ms inside the
# 678 ms DynamicDepth step (benchmarks/bench_dynamic_decompose.py) — the
# same gather wall the manydepth kernel removed. `cv_min`/missing
# semantics and the (rarely used) `cv_pool` infill stay in XLA.
# ---------------------------------------------------------------------------


def _make_kernel_occ(mxu_precision: str, pool_th: float):
    prec = {"highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT}[mxu_precision]
    return functools.partial(_kernel_occ, prec, pool_th)


def _kernel_occ(prec, pool_th, dbins_ref, M_ref, t_ref, apply_ref,
                lookup_ref, cur_ref, out_ref):
    """Like `_kernel`, with lookup_ref carrying C+1 channels (last = the
    occlusion mask) and apply_ref (BF,) SMEM gating the substitution
    (`aug_mask == 0` items only, `resnet_encoder.py:173`)."""
    bi = pl.program_id(0)
    di = pl.program_id(1)
    d = dbins_ref[di]

    h = lookup_ref.shape[1]
    C1 = lookup_ref.shape[2]          # C + 1 (occ channel last)
    w = lookup_ref.shape[3]

    m00 = M_ref[bi, 0, 0]; m01 = M_ref[bi, 0, 1]; m02 = M_ref[bi, 0, 2]
    m10 = M_ref[bi, 1, 0]; m11 = M_ref[bi, 1, 1]; m12 = M_ref[bi, 1, 2]
    m20 = M_ref[bi, 2, 0]; m21 = M_ref[bi, 2, 1]; m22 = M_ref[bi, 2, 2]
    t0 = t_ref[bi, 0]; t1 = t_ref[bi, 1]; t2 = t_ref[bi, 2]
    apply_occ = apply_ref[bi]

    u = lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
    xin = lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(jnp.float32)

    def row_body(v, _):
        vf = v.astype(jnp.float32)
        xh = d * (m00 * u + m01 * vf + m02) + t0
        yh = d * (m10 * u + m11 * vf + m12) + t1
        zh = d * (m20 * u + m21 * vf + m22) + t2
        x = xh / (zh + 1e-7)
        y = yh / (zh + 1e-7)

        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wx0 = 1.0 - wx1
        wy1 = y - y0
        wy0 = 1.0 - wy1

        Wx = ((xin == x0) * wx0 + (xin == (x0 + 1.0)) * wx1)  # (w, w)

        rbase = jnp.min(y0).astype(jnp.int32)
        rtop = jnp.max(y0).astype(jnp.int32) + 1
        rbase_c = jnp.clip(rbase, -1, h)
        rcount = jnp.clip(rtop - rbase_c + 1, 0, h + 2)

        def band_body(k, warped):
            r = rbase_c + k
            rf = r.astype(jnp.float32)
            in_img = (r >= 0) & (r < h)
            s_r = ((y0 == rf) * wy0 + ((y0 + 1.0) == rf) * wy1)
            s_r = jnp.where(in_img, s_r, 0.0)
            rc = jnp.clip(r, 0, h - 1)
            T_r = lookup_ref[0, rc]                 # (C+1, w)
            W_r = Wx * s_r
            return warped + jax.lax.dot_general(
                T_r, W_r, (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32)

        warped = lax.fori_loop(
            0, rcount, band_body, jnp.zeros((C1, w), jnp.float32))

        # cv_set_1: occluded-in-lookup pixels contribute cost vs an
        # all-ones feature vector (`resnet_encoder.py:186-189`)
        occ_w = warped[C1 - 1:C1]                   # (1, w)
        omask = ((occ_w > pool_th)
                 & (apply_occ > 0.0)).astype(jnp.float32)
        feats = warped[:C1 - 1]
        feats = feats * (1.0 - omask) + omask       # where(omask, 1, feats)

        cur_row = cur_ref[0, v]                     # (C, w)
        diff = jnp.mean(jnp.abs(feats - cur_row), axis=0, keepdims=True)

        edge = ((x >= 2.0) & (x <= w - 2) & (y >= 2.0) & (y <= h - 2))
        inner = (u >= 2.0) & (u <= w - 3) & (vf >= 2.0) & (vf <= h - 3)
        diff = diff * (edge & inner).astype(jnp.float32)

        out_ref[0, 0, v] = diff[0]
        return 0

    lax.fori_loop(0, h, row_body, 0)


@functools.partial(jax.jit, static_argnames=("pool_th", "interpret",
                                             "mxu_precision"))
def plane_sweep_diffs_occ_pallas(cur_feats: Array, lookup_feats: Array,
                                 occ: Array, apply_occ: Array,
                                 M: Array, t: Array, depth_bins: Array,
                                 pool_th: float = 0.7,
                                 interpret: bool = False,
                                 mxu_precision: str = "highest") -> Array:
    """Per-frame masked L1 diffs with the cv_set_1 occlusion substitution.

    cur_feats/lookup_feats: (BF, h, w, C); occ: (BF, h, w) in [0, 1];
    apply_occ: (BF,) 1.0 where the substitution applies; M/t/depth_bins as
    in `plane_sweep_diffs_pallas`. Returns (BF, D, h, w).
    """
    BF, h, w, C = cur_feats.shape
    D = depth_bins.shape[0]

    lookup_aug = jnp.concatenate(
        [lookup_feats, occ[..., None].astype(lookup_feats.dtype)], axis=-1)
    lookup_T = jnp.swapaxes(lookup_aug, 2, 3)        # (BF, h, C+1, w)
    cur_T = jnp.swapaxes(cur_feats, 2, 3)

    return pl.pallas_call(
        _make_kernel_occ(mxu_precision, float(pool_th)),
        grid=(BF, D),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # depth bins (D,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # M (BF, 3, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # t (BF, 3)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # apply_occ (BF,)
            pl.BlockSpec((1, h, C + 1, w), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, C, w), lambda b, d: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BF, D, h, w), jnp.float32),
        interpret=interpret,
    )(depth_bins.astype(jnp.float32), M, t,
      apply_occ.astype(jnp.float32), lookup_T, cur_T)
