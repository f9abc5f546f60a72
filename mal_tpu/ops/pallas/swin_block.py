"""Fused Swin block kernels (frozen-eval forward).

Builds on `ops/pallas/window_attention.py` (scores-stay-in-VMEM attention):
these kernels additionally pull the LayerNorms, the qkv/proj projections,
and the MLP into Pallas, eliminating the per-block window
partition/reverse relayouts and the qkv / attn-out / MLP-hidden HBM
round-trips that dominate the measured Swin stage times
(benchmarks/PROFILE.md: the attention kernel itself is ~13 ms of the
105 ms Swin-L backbone; the remaining ~92 ms is XLA Dense/LN/layout
passes).

Forward-only by design: MAL runs the segmenter frozen under stop-gradient
(`manydepth/trainer.py:350-357`), and the reference itself evaluates it
inside `acc.autocast()` (`manydepth/trainer.py:573`), so a reduced-traffic
bf16-matmul forward is faithful to the reference's own execution.

Kernel A — attention half. Grid cell = one (image, window-row, window-col)
tile of the PRE-rolled/padded residual stream:

    read (ws, ws, C) tile -> LayerNorm (fp32) -> qkv = y@Wqkv + b ->
    per-head scores (+ relative-position bias + shift mask) -> softmax ->
    @v -> proj -> write (ws, ws, C) tile.

The only HBM traffic is one read + one write of the residual stream plus
the per-window bias block; qkv, scores, and the attention output never
leave VMEM. The window partition/reverse transposes disappear entirely —
the BlockSpec index map IS the partition.

Kernel B — MLP half, token-tiled:

    read (T, C) tokens -> LayerNorm -> fc1 -> exact gelu -> fc2 ->
    + residual -> write (T, C).

Weight residency: weights are passed whole with a constant index map, so
Mosaic keeps them VMEM-resident across grid steps. At bf16 compute the
largest fused case (Swin-L stage 2, C=768, hidden 3072) fits the ~16 MB
VMEM budget; C=1536 (stage 3) does not and callers must fall back to the
unfused path (see `fusable()`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# flax.linen.LayerNorm default epsilon (the swin.py modules use default
# args, so the kernels must match flax, not torch's 1e-5)
LN_EPS = 1e-6

_DOT = dict(preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)


def _layernorm(x: Array, scale: Array, bias: Array) -> Array:
    """fp32 LayerNorm over the last axis, flax epsilon."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _erf(x: Array) -> Array:
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7 ~ fp32
    eps). Mosaic has no erf/erfc primitive, so the exact-gelu erf is
    rebuilt in-kernel from exp (supported)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    p = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
             + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - p * jnp.exp(-a * a))


def _gelu_exact(x: Array) -> Array:
    """torch nn.GELU / jax.nn.gelu(approximate=False) rebuilt on _erf."""
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _attn_kernel(x_ref, valid_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                 bias_ref, wproj_ref, bproj_ref, out_ref, *, num_heads: int,
                 compute_dtype):
    # x_ref: (Bb, 1, ws, 1, ws, C) — a window tile of the 6-D contiguous
    # view (B, nH, ws, nW, ws, C); the last two block dims (ws, C) equal
    # the array dims, satisfying Mosaic's block-mapping rule (ws=7/12 is
    # not 8-divisible, so a (.., ws, ws, C) 4-D tile cannot lower).
    Bb, _, ws_h, _, ws_w, C = x_ref.shape
    N = ws_h * ws_w
    h = num_heads
    d = C // h
    scale = float(d) ** -0.5

    # Bb images of the SAME window position share one LN/qkv/proj matmul
    # (better MXU M-tiling than per-window M=144) and one bias block
    x = x_ref[:].astype(jnp.float32)
    y = _layernorm(x, lns_ref[0].astype(jnp.float32),
                   lnb_ref[0].astype(jnp.float32))
    # the unfused path (and the torch reference, `backbone/swin.py` W-MSA
    # forward) zero-pads AFTER norm1: padded tokens enter attention as
    # zeros. LN runs in-kernel here, so zero them explicitly.
    y = (y * valid_ref[:]).reshape(Bb * N, C)

    qkv = jax.lax.dot_general(
        y.astype(compute_dtype), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    qkv = qkv + bqkv_ref[0].astype(jnp.float32)          # (Bb*N, 3C) fp32
    qkv = qkv.astype(compute_dtype)

    # per-(image, head) attention: two small 2-D matmuls each, scores
    # (N, N) fp32 in VMEM only; output assembled image-row by head-column
    rows = []
    for b in range(Bb):
        blk = qkv[b * N:(b + 1) * N]
        outs = []
        for i in range(h):
            q = blk[:, i * d:(i + 1) * d]
            k = blk[:, C + i * d:C + (i + 1) * d]
            v = blk[:, 2 * C + i * d:2 * C + (i + 1) * d]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                **_DOT) * scale                          # (N, N) fp32
            s = s + bias_ref[0, i]
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            s = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                s.astype(compute_dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())), **_DOT))
        rows.append(jnp.concatenate(outs, axis=1))       # (N, C) fp32
    attn = jnp.concatenate(rows, axis=0)                 # (Bb*N, C)

    out = jax.lax.dot_general(
        attn.astype(compute_dtype), wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    out = out + bproj_ref[0].astype(jnp.float32)
    out_ref[:] = out.reshape(Bb, 1, ws_h, 1, ws_w, C).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("window_size", "num_heads", "compute_dtype",
                              "interpret"))
def swin_attn_fused(xr: Array, valid: Array, ln_scale: Array,
                    ln_bias: Array, wqkv: Array, bqkv: Array,
                    bias_all: Array, wproj: Array, bproj: Array, *,
                    window_size: int, num_heads: int,
                    compute_dtype=jnp.float32,
                    interpret: bool = False) -> Array:
    """Fused LN1 + qkv + windowed attention + proj.

    xr: (B, Hp, Wp, C) residual stream, already padded to window multiples
        and rolled for shifted layers (one XLA copy pass).
    valid: (Hp, Wp) fp32 — 1 where the token is real, 0 in the pad region,
        rolled the same way as xr (post-LN zeroing matches the unfused
        pad-after-norm1 semantics).
    bias_all: (nm, h, N, N) fp32 — relative-position bias (+ shift mask),
        one entry per in-image window position (nm = nHp*nWp) or nm=1 when
        every window shares it. Window (i, j) reads entry (i*nWp+j) % nm.
    Weights are flax Dense layout: wqkv (C, 3C), wproj (C, C).

    Returns (B, Hp, Wp, C) fp32 attention output in rolled/padded space
    (caller un-rolls, crops, and adds the residual — one XLA pass).
    """
    B, Hp, Wp, C = xr.shape
    ws = window_size
    assert Hp % ws == 0 and Wp % ws == 0, (Hp, Wp, ws)
    nH, nW = Hp // ws, Wp // ws
    N = ws * ws
    nm = bias_all.shape[0]
    assert bias_all.shape == (nm, num_heads, N, N), bias_all.shape
    assert valid.shape == (Hp, Wp), valid.shape

    wqkv = wqkv.astype(compute_dtype)
    wproj = wproj.astype(compute_dtype)

    # batch-block: images at the same window position share the bias and
    # one big LN/qkv/proj matmul; Bb*N rows fill MXU M-tiles (a single
    # window is M=144, 56% of two 128-tiles). The VMEM byte model keeps the
    # kernel under the ~16 MB/core budget (guide: VMEM ~16 MB): fp32
    # intermediates (x, y, qkv=3C, attn, out, slack ~9 C-widths per token)
    # scale with Bb; weights/bias/in-out tiles are resident (x2 for Mosaic
    # double buffering). Mosaic's scoped-stack check measured 22.15 MB at
    # stage-1 fp32 with the old token-count-only cap (Bb=6) and rejected it.
    wbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    resident = 2 * (4 * C * C * wbytes + num_heads * N * N * 4)
    per_img = N * C * (4 * 9) + N * 3 * C * wbytes
    budget = 13 * 1024 * 1024
    Bb = 1
    for cand in range(1, B + 1):
        if (B % cand == 0 and cand * N <= 1152 and cand * num_heads <= 96
                and resident + cand * per_img <= budget):
            Bb = cand

    # 6-D contiguous views: (B, Hp, Wp, C) -> (B, nH, ws, nW, ws, C) is a
    # free reshape (no data movement) and makes the tile's last two dims
    # equal the array dims — the BlockSpec index map IS the partition.
    x6 = xr.reshape(B, nH, ws, nW, ws, C)
    # valid re-laid out to (nH, nW, ws, 1, ws, 1) so the in-kernel tile
    # broadcasts directly against (Bb, 1, ws, 1, ws, C); it is a (Hp, Wp)
    # scalar mask, so this transpose is negligible and happens once.
    v6 = (valid.astype(jnp.float32).reshape(nH, ws, nW, ws)
          .transpose(0, 2, 1, 3).reshape(nH, nW, ws, 1, ws, 1))

    tile = pl.BlockSpec((Bb, 1, ws, 1, ws, C),
                        lambda b, i, j: (b, i, 0, j, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda b, i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads,
                          compute_dtype=compute_dtype),
        grid=(B // Bb, nH, nW),
        interpret=interpret,
        in_specs=[
            tile,
            pl.BlockSpec((1, 1, ws, 1, ws, 1),
                         lambda b, i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),
            full(wqkv), vec(3 * C),
            pl.BlockSpec((1, num_heads, N, N),
                         lambda b, i, j: ((i * nW + j) % nm, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wproj), vec(C),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, nH, ws, nW, ws, C), jnp.float32),
    )(x6, v6, ln_scale.reshape(1, C),
      ln_bias.reshape(1, C), wqkv, bqkv.reshape(1, 3 * C),
      bias_all.astype(jnp.float32), wproj, bproj.reshape(1, C))
    return out.reshape(B, Hp, Wp, C)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, *, compute_dtype):
    x = x_ref[:].astype(jnp.float32)                     # (T, C)
    y = _layernorm(x, lns_ref[0].astype(jnp.float32),
                   lnb_ref[0].astype(jnp.float32))
    hid = jax.lax.dot_general(
        y.astype(compute_dtype), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    hid = hid + b1_ref[0].astype(jnp.float32)
    hid = _gelu_exact(hid)                               # torch exact erf
    z = jax.lax.dot_general(
        hid.astype(compute_dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    z = z + b2_ref[0].astype(jnp.float32)
    out_ref[:] = (x + z).astype(out_ref.dtype)


def _token_tile(n_tokens: int, target: int = 512) -> int:
    """Largest divisor of n_tokens that is <= target (>= 1)."""
    best = 1
    for t in range(1, target + 1):
        if n_tokens % t == 0:
            best = t
    return best


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def swin_mlp_fused(x: Array, ln_scale: Array, ln_bias: Array,
                   w1: Array, b1: Array, w2: Array, b2: Array, *,
                   compute_dtype=jnp.float32,
                   interpret: bool = False) -> Array:
    """Fused LN2 + fc1 + exact-gelu + fc2 + residual.

    x: (n_tokens, C) post-attention residual stream. Returns the block
    output (n_tokens, C) fp32 (x + MLP(LN(x)))."""
    n_tokens, C = x.shape
    hidden = w1.shape[1]
    # token-tile sized to the same ~13 MB VMEM budget as the attention
    # kernel: weights are resident (x2 Mosaic buffering), per-token live
    # bytes are the fp32 x/y/z/out (4C) + the gelu hidden (hidden)
    wbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    resident = 2 * 2 * C * hidden * wbytes
    per_tok = (4 * C + hidden) * 4 + (C + hidden) * wbytes
    avail = 13 * 1024 * 1024 - resident
    T = _token_tile(n_tokens, max(min(512, avail // per_tok), 8))

    row = lambda a: pl.BlockSpec((T, a.shape[-1]), lambda t: (t, 0),
                                 memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda t: (0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda t: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    w1 = w1.astype(compute_dtype)
    w2 = w2.astype(compute_dtype)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, compute_dtype=compute_dtype),
        grid=(n_tokens // T,),
        interpret=interpret,
        in_specs=[row(x), vec(C), vec(C), full(w1), vec(hidden),
                  full(w2), vec(C)],
        out_specs=row(x),
        out_shape=jax.ShapeDtypeStruct((n_tokens, C), jnp.float32),
    )(x, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
      w1, b1.reshape(1, hidden), w2, b2.reshape(1, C))


def fusable(dim: int, compute_dtype, window_size: int = 12) -> bool:
    """Static VMEM-budget gate mirroring the byte model inside
    `swin_attn_fused` (at Bb=1) and `swin_mlp_fused`. At bf16 compute this
    admits Swin-L stages 0-1 (C <= 384); stage 2 (C=768: Wmlp alone is
    9.4 MB bf16, double-buffered 19 MB) and stage 3 (C=1536) fall back to
    the unfused path (which still uses the Pallas window-attention
    kernel)."""
    wbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    N = window_size * window_size
    heads = max(dim // 32, 1)  # Swin-L: heads = C/32 at every stage
    budget = 13 * 1024 * 1024
    attn = (2 * (4 * dim * dim * wbytes + heads * N * N * 4)
            + N * dim * 36 + N * 3 * dim * wbytes)
    hidden = 4 * dim
    mlp = (2 * 2 * dim * hidden * wbytes
           + 8 * ((4 * dim + hidden) * 4 + (dim + hidden) * wbytes))
    return attn <= budget and mlp <= budget
