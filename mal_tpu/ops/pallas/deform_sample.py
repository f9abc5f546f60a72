"""Deformable-attention sampling as separable one-hot MXU matmuls (Pallas).

The reference's MSDeformAttn is a CUDA im2col gather kernel
(`mask2former/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh`).
On TPU, XLA lowers the equivalent bilinear sampling to generic gathers that
are index-rate-bound at ~80M idx/s (benchmarks/HISTORY.md round 3) — ~37 ms
per encoder layer. But the per-(batch, head) level value maps are tiny
(level-0 at 192x640: 1920 tokens x 32 ch = 245 KB), so bilinear sampling can
be reformulated EXACTLY as two separable one-hot contractions that run on
the MXU instead of the gather unit:

    out[c, s] = sum_r wy[r, s] * sum_k V[r*ch + c, k] * wx[k, s]

Layout (v2, transposed): channels live in SUBLANES and samples in LANES.

- stage 1: U = Vmat @ A, a dense (h_l*ch, w_l) @ (w_l, S) matmul where A
  has at most two non-zeros per column (the x-corner weights, built in-VMEM
  by sublane-iota comparison — no scatter);
- stage 2: for each row r of the level, a (1, S) y-corner mask broadcasts
  over a NATIVE 32-aligned sublane slice U[r*ch:(r+1)*ch] and accumulates.

All three pyramid levels run inside one kernel per grid step (one U buffer
at a time), and the bilinear corner math (align_corners=False, zeros
padding, clamp-to-edge base with weight zeroing — the same scheme as
`grid_sample_packed`) happens in-kernel on (1, S) vectors, so the XLA side
only lays out coordinates head-major and pads.

Forward-only: MAL runs the segmenter frozen (`manydepth/trainer.py:350`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE = 128
SAMPLE_TILE = 16 * LANE  # samples per grid step (S)


def _corner_weights(c, size):
    """In-kernel axis corner weights: c is the continuous source coordinate
    (already scaled, -0.5 applied), shape (1, S). Returns (c0 int32 clamped
    base, s0, s1) with zeros-padding semantics: out-of-range corners get
    weight 0, and a base of -1 re-lands its valid corner on index 0."""
    c0f = jnp.floor(c)
    w1 = c - c0f
    w0 = 1.0 - w1
    cc = jnp.clip(c0f, 0, size - 1)
    dx = cc - c0f
    s0 = jnp.where(dx == 0, w0 * (c0f >= 0), jnp.where(dx == 1, w1, 0.0))
    s1 = jnp.where(dx == 0, w1 * (c0f + 1 <= size - 1), 0.0)
    return cc.astype(jnp.int32), s0, s1


def _kernel(vm0_ref, vm1_ref, vm2_ref, x_ref, y_ref, aw_ref, out_ref, *,
            shapes: tuple[tuple[int, int], ...], ch: int,
            mxu_precision: str = "high"):
    vms = (vm0_ref, vm1_ref, vm2_ref)
    acc = jnp.zeros((ch, SAMPLE_TILE), jnp.float32)
    for lvl, (h_l, w_l) in enumerate(shapes):
        x = x_ref[0, 0, lvl:lvl + 1] * w_l - 0.5  # (1, S) continuous coords
        y = y_ref[0, 0, lvl:lvl + 1] * h_l - 0.5
        aw = aw_ref[0, 0, lvl:lvl + 1]
        x0, xs0, xs1 = _corner_weights(x, w_l)
        y0, ys0, ys1 = _corner_weights(y, h_l)
        xs0 = xs0 * aw                            # fold attention weight
        xs1 = xs1 * aw

        # x one-hot, samples in lanes: A[k, s] = xs0*(k==x0) + xs1*(k==x0+1)
        kcol = jax.lax.broadcasted_iota(jnp.int32, (w_l, SAMPLE_TILE), 0)
        A = (jnp.where(kcol == x0, xs0, 0.0)
             + jnp.where(kcol == x0 + 1, xs1, 0.0))

        # fp32-accurate matmul via 3x bf16 (hi/lo split, fp32 accumulation,
        # dropped lo@lo term is < 2^-22 relative): Mosaic's HIGHEST (6-pass)
        # measured 4x slower than 1-pass bf16 and ~2x slower than this.
        # mxu_precision="bf16" (the bf16_backbone fast-training mode) drops
        # the correction passes: one hi@hi matmul, fp32 accumulation.
        vm = vms[lvl][0]
        vm_hi = vm.astype(jnp.bfloat16)
        a_hi = A.astype(jnp.bfloat16)

        def mm(a, b):
            # explicit precision: Mosaic rejects the HIGH an ambient
            # default_matmul_precision("tensorfloat32") would inject
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        if mxu_precision == "bf16":
            U = mm(vm_hi, a_hi)
        else:
            vm_lo = (vm - vm_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            a_lo = (A - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            U = mm(vm_hi, a_hi) + (mm(vm_hi, a_lo) + mm(vm_lo, a_hi))

        # y corners: per source row r, a (1, S) mask over a native sublane
        # slice of U
        for r in range(h_l):
            m = jnp.where(y0 == r, ys0, 0.0) + jnp.where(y0 + 1 == r, ys1,
                                                         0.0)
            acc = acc + m * U[r * ch:(r + 1) * ch]
    out_ref[0, 0] = acc


QUERY_TILE = 10 * LANE  # queries per grid step for the v4 kernel (Sq)


def _kernel_v4(vm0_ref, vm1_ref, vm2_ref, x_ref, y_ref, aw_ref, out_ref, *,
               shapes: tuple[tuple[int, int], ...], ch: int,
               mxu_precision: str = "high"):
    """One (g, tq, p) grid cell: sample every level at point p of the
    tile's queries and ACCUMULATE into the (ch, Sq) output tile — the
    innermost p dim has a constant output index map, so the P-sum that
    v3 left to a 126 MB XLA post-pass happens in VMEM for free."""
    vms = (vm0_ref, vm1_ref, vm2_ref)
    acc = jnp.zeros((ch, QUERY_TILE), jnp.float32)
    for lvl, (h_l, w_l) in enumerate(shapes):
        # coord blocks are (1, 1, 1, L, Sq) views of (G, P, Tq, L, Sq)
        x = x_ref[0, 0, 0, lvl:lvl + 1] * w_l - 0.5   # (1, Sq) continuous
        y = y_ref[0, 0, 0, lvl:lvl + 1] * h_l - 0.5
        aw = aw_ref[0, 0, 0, lvl:lvl + 1]
        x0, xs0, xs1 = _corner_weights(x, w_l)
        y0, ys0, ys1 = _corner_weights(y, h_l)
        xs0 = xs0 * aw
        xs1 = xs1 * aw

        kcol = jax.lax.broadcasted_iota(jnp.int32, (w_l, QUERY_TILE), 0)
        A = (jnp.where(kcol == x0, xs0, 0.0)
             + jnp.where(kcol == x0 + 1, xs1, 0.0))

        vm = vms[lvl][0]
        vm_hi = vm.astype(jnp.bfloat16)
        a_hi = A.astype(jnp.bfloat16)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)

        if mxu_precision == "bf16":
            U = mm(vm_hi, a_hi)
        else:
            vm_lo = (vm - vm_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            a_lo = (A - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            U = mm(vm_hi, a_hi) + (mm(vm_hi, a_lo) + mm(vm_lo, a_hi))

        for r in range(h_l):
            m = jnp.where(y0 == r, ys0, 0.0) + jnp.where(y0 + 1 == r, ys1,
                                                         0.0)
            acc = acc + m * U[r * ch:(r + 1) * ch]

    p = pl.program_id(2)

    @pl.when(p == 0)
    def _init():
        out_ref[0, 0] = acc

    @pl.when(p != 0)
    def _accum():
        out_ref[0, 0] = out_ref[0, 0] + acc


@functools.partial(jax.jit, static_argnames=("shapes", "ch", "n_points",
                                              "interpret", "mxu_precision"))
def deform_sample_fused_v4(vm0: Array, vm1: Array, vm2: Array, x: Array,
                           y: Array, aw: Array,
                           shapes: tuple[tuple[int, int], ...], ch: int,
                           n_points: int, interpret: bool = False,
                           mxu_precision: str = "high") -> Array:
    """P-in-grid variant (v4). vm_l as in `deform_sample_fused`; x/y/aw:
    (G, P, Tq, L, Sq) normalized-[0,1] coordinates / attention weights,
    query-major, queries padded to Tq*Sq with aw=0. Returns
    (G, Tq, ch, Sq) sampled values summed over levels AND points — the
    (B, Lq, heads*ch) output needs only one friendly transpose. Block
    shapes obey Mosaic's rule (last two dims divisible by (8, 128) or
    equal to the array dims): the coord blocks take the full (L, Sq)
    minor plane, the out block the full (ch, Sq)."""
    G, P, Tq, L, Sq = x.shape
    assert Sq == QUERY_TILE and P == n_points

    def vspec(hw):
        h_l, w_l = hw
        return pl.BlockSpec((1, h_l * ch, w_l), lambda g, t, p: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    coord_spec = pl.BlockSpec((1, 1, 1, L, Sq),
                              lambda g, t, p: (g, p, t, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v4, shapes=shapes, ch=ch,
                          mxu_precision=mxu_precision),
        grid=(G, Tq, P),
        interpret=interpret,
        in_specs=[vspec(shapes[0]), vspec(shapes[1]), vspec(shapes[2]),
                  coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((1, 1, ch, Sq), lambda g, t, p: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Tq, ch, Sq), jnp.float32),
    )(vm0, vm1, vm2, x, y, aw)


@functools.partial(jax.jit, static_argnames=("shapes", "ch", "interpret",
                                              "mxu_precision"))
def deform_sample_fused(vm0: Array, vm1: Array, vm2: Array, x: Array,
                        y: Array, aw: Array,
                        shapes: tuple[tuple[int, int], ...], ch: int,
                        interpret: bool = False,
                        mxu_precision: str = "high") -> Array:
    """vm_l: (G, h_l*ch, w_l) transposed level values per (batch*head) group,
    row-major rows (row r of the level occupies sublanes r*ch..r*ch+ch).
    x/y/aw: (G, T, L, SAMPLE_TILE) normalized-[0,1] sampling coordinates and
    attention weights, head-major samples padded to T*SAMPLE_TILE (pad with
    aw=0). Returns (G, T, ch, SAMPLE_TILE) sampled values (sum over levels,
    attention weight applied)."""
    G, T, L, S = x.shape
    assert S == SAMPLE_TILE

    def vspec(hw):
        h_l, w_l = hw
        return pl.BlockSpec((1, h_l * ch, w_l), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    coord_spec = pl.BlockSpec((1, 1, L, S), lambda g, t: (g, t, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, shapes=shapes, ch=ch,
                          mxu_precision=mxu_precision),
        grid=(G, T),
        interpret=interpret,
        in_specs=[vspec(shapes[0]), vspec(shapes[1]), vspec(shapes[2]),
                  coord_spec, coord_spec, coord_spec],
        out_specs=pl.BlockSpec((1, 1, ch, S), lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, ch, S), jnp.float32),
    )(vm0, vm1, vm2, x, y, aw)
