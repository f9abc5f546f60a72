"""Fused windowed-attention Pallas kernel (Swin, frozen-eval forward).

The reference's Swin window attention (`mask2former/modeling/backbone/
swin.py:170-260`) maps to thousands of tiny (N=144, d=32) batched matmuls
per layer with the (nW, h, N, N) score tensor materialized in HBM between
qk^T, bias add, mask add, softmax, and @v — measured 6.7-11.5 ms per
Swin-L layer on v5e, entirely overhead/layout-bound (the FLOPs are <1 ms).
This kernel fuses the whole chain per window: scores never leave VMEM.

Forward-only by design: MAL runs the segmenter frozen under stop-gradient
(`manydepth/trainer.py:350-357`), so no VJP is needed.

Layouts (per window w in the grid):
  q, k, v:  (nW, h, N, d)   block (1, h, N, d)
  bias:     (nm, h, N, N)   block (1, h, N, N), index w % nm
            = relative-position bias (+ shift mask for shifted layers),
            precomputed once per call on the XLA side
  out:      (nW, h, N, d)

N = window_size^2 (144 for ws=12 — a multiple of 8 sublanes), d = 32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)      # (h, N, d)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0]                    # (h, N, N) fp32

    # explicit precision: Mosaic rejects HIGH, which an ambient
    # jax.default_matmul_precision("tensorfloat32") would otherwise inject
    scores = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # (h, N, N)
    scores = scores + bias

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = e / jnp.sum(e, axis=-1, keepdims=True)

    out = jax.lax.dot_general(
        s, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # (h, N, d)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_wins_per_image", "interpret"))
def window_attention_fused(q: Array, k: Array, v: Array, bias: Array,
                           num_wins_per_image: int = 1,
                           interpret: bool = False) -> Array:
    """q/k/v: (nW, h, N, d); bias: (nm, h, N, N) with nm =
    `num_wins_per_image` (1 when every window shares the bias). Returns
    (nW, h, N, d) fp32 attention output."""
    nW, h, N, d = q.shape
    nm = bias.shape[0]
    assert nm == num_wins_per_image, (nm, num_wins_per_image)
    scale = float(d) ** -0.5

    # head-chunk the grid so per-step VMEM (qkv + bias + scores) stays well
    # under the 16 MB scoped limit (Swin-L stage 4 has 48 heads)
    hb = h
    for cand in (12, 8, 6, 4, 3, 2, 1):
        if h % cand == 0 and cand <= 12:
            hb = cand
            break

    qkv_spec = pl.BlockSpec((1, hb, N, d), lambda w, c: (w, c, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(nW, h // hb),
        interpret=interpret,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, hb, N, N), lambda w, c: (w % nm, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, N, d), lambda w, c: (w, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nW, h, N, d), jnp.float32),
    )(q, k, v, bias)


def window_attention_reference(q: Array, k: Array, v: Array,
                               bias: Array) -> Array:
    """Pure-XLA equivalent (the pre-kernel math) for equivalence tests.

    q/k/v: (nW, h, N, d); bias broadcastable (nW or nm, h, N, N) — callers
    tile it to nW."""
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("whnd,whmd->whnm", q * scale, k)
    scores = scores + bias
    s = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("whnm,whmd->whnd", s, v)
