"""Deformable-attention sampling as separable one-hot MXU matmuls (Pallas).

The reference's MSDeformAttn is a CUDA im2col gather kernel
(`mask2former/modeling/pixel_decoder/ops/src/cuda/ms_deform_im2col_cuda.cuh`).
On TPU, XLA lowers the equivalent bilinear sampling to generic gathers that
are index-rate-bound at ~80M idx/s (benchmarks/HISTORY.md round 3) — ~37 ms
per encoder layer. But the per-(batch, head) level value maps are tiny
(level-0 at 192x640: 1920 tokens x 32 ch = 245 KB), so bilinear sampling can
be reformulated EXACTLY as two separable one-hot contractions that run on
the MXU instead of the gather unit:

    out[s, c] = sum_r wy[s, r] * sum_k wx[s, k] * V[r, k, c]

- stage 1: a dense matmul A(samples, W_l) @ Vmat(W_l, H_l*C) where A has at
  most two non-zeros per row (the x-corner weights, built in-VMEM by integer
  iota comparison — no scatter);
- stage 2: an elementwise masked reduction over the H_l row groups (the two
  y-corner weights), done with static lane slices.

Zeros-padding / align_corners=False corner logic is folded into the weights
on the XLA side (same `axis_w` scheme as `grid_sample_packed`), and the
deformable attention weight is folded into the x-weights, so the kernel's
output only needs a sum over sampling points.

Forward-only: MAL runs the segmenter frozen (`manydepth/trainer.py:350`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SUB, _LANE = 8, 128
TILE = _SUB * _LANE  # samples per grid step


def _kernel(vmat_ref, x0_ref, xs0_ref, xs1_ref, y0_ref, ys0_ref, ys1_ref,
            out_ref, *, w_l: int, h_l: int, ch: int):
    vmat = vmat_ref[0]                      # (w_l, h_l*ch)
    x0 = x0_ref[0, 0]                       # (8, 128) int32 (clamped)
    y0 = y0_ref[0, 0]

    # x one-hot with both corner weights: A[s, k] = xs0*(k==x0) + xs1*(k==x0+1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, w_l), 2)
    A = (jnp.where(kcol == x0[..., None], xs0_ref[0, 0][..., None], 0.0)
         + jnp.where(kcol == x0[..., None] + 1, xs1_ref[0, 0][..., None],
                     0.0))

    U = jax.lax.dot_general(
        A, vmat, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # exact fp32 (parity with
    # the XLA gather path; default TPU precision would bf16-round)

    # y mask over row groups: wy[s, r*ch + c] = ys0*(r==y0) + ys1*(r==y0+1)
    rcol = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE, h_l * ch), 2)
    rcol = rcol // ch
    wy = (jnp.where(rcol == y0[..., None], ys0_ref[0, 0][..., None], 0.0)
          + jnp.where(rcol == y0[..., None] + 1, ys1_ref[0, 0][..., None],
                      0.0))
    M = U * wy

    # reduce the h_l row groups with static lane slices
    acc = M[..., 0:ch]
    for r in range(1, h_l):
        acc = acc + M[..., r * ch:(r + 1) * ch]
    out_ref[0, 0] = acc.reshape(TILE, ch)


@functools.partial(jax.jit, static_argnames=("w_l", "h_l", "interpret"))
def deform_sample_level(vmat: Array, x0: Array, xs0: Array, xs1: Array,
                        y0: Array, ys0: Array, ys1: Array,
                        w_l: int, h_l: int,
                        interpret: bool = False) -> Array:
    """vmat: (G, w_l, h_l*ch) column-major level values per (batch*head);
    x0/y0: (G, T, 8, 128) int32 clamped corner bases; xs*/ys*: matching
    fp32 corner weights (attention weight folded into xs*, zeros-padding
    corner logic pre-applied). Returns (G, T, TILE, ch) sampled values."""
    G, T = x0.shape[:2]
    ch = vmat.shape[-1] // h_l

    coord_spec = pl.BlockSpec((1, 1, _SUB, _LANE),
                              lambda g, t: (g, t, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, w_l=w_l, h_l=h_l, ch=ch),
        grid=(G, T),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, w_l, h_l * ch), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec, coord_spec,
            coord_spec, coord_spec, coord_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, TILE, ch), lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, TILE, ch), jnp.float32),
    )(vmat, x0, xs0, xs1, y0, ys0, ys1)
