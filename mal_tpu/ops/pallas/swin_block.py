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

Weight residency: an innermost grid dimension streams the weights in
head-group (attention) / hidden-group (MLP) blocks while the output tile
accumulates in VMEM, so every Swin-L stage (C up to 1536) fits the
~16 MB/core VMEM budget; the per-shape plans are chosen by a byte model
(`_attn_plan`, `_mlp_plan`, gate `fusable()`).
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
                 bias_ref, wproj_ref, bproj_ref, out_ref, acc_ref, *,
                 heads_per_group: int, compute_dtype):
    # x_ref: (Bb, 1, ws, 1, ws, C) — a window tile of the 6-D contiguous
    # view (B, nH, ws, nW, ws, C); the last two block dims (ws, C) equal
    # the array dims, satisfying Mosaic's block-mapping rule (ws=7/12 is
    # not 8-divisible, so a (.., ws, ws, C) 4-D tile cannot lower).
    #
    # Head-group blocking (innermost grid dim g): wqkv_ref is the group's
    # (1, C, 3*Cg) packed column block, wproj_ref the matching (Cg, C) row
    # block, bias_ref the group's heads; the (Bb*N, C) projection partial
    # accumulates into out_ref across g (out index map is constant in g,
    # so the tile stays resident in VMEM). G=1 degenerates to whole-weight
    # fusion; G>1 admits Swin-L stages 2-3 (C>=768) under the VMEM budget.
    Bb, _, ws_h, _, ws_w, C = x_ref.shape
    N = ws_h * ws_w
    hg = heads_per_group
    Cg = wproj_ref.shape[0]
    d = Cg // hg
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
        y.astype(compute_dtype), wqkv_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    qkv = qkv + bqkv_ref[0].astype(jnp.float32)          # (Bb*N, 3Cg) fp32
    qkv = qkv.astype(compute_dtype)

    # per-(image, head) attention: two small 2-D matmuls each, scores
    # (N, N) fp32 in VMEM only; output assembled image-row by head-column
    rows = []
    for b in range(Bb):
        blk = qkv[b * N:(b + 1) * N]
        outs = []
        for i in range(hg):
            q = blk[:, i * d:(i + 1) * d]
            k = blk[:, Cg + i * d:Cg + (i + 1) * d]
            v = blk[:, 2 * Cg + i * d:2 * Cg + (i + 1) * d]
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
        rows.append(jnp.concatenate(outs, axis=1))       # (N, Cg) fp32
    attn = jnp.concatenate(rows, axis=0)                 # (Bb*N, Cg)

    part = jax.lax.dot_general(
        attn.astype(compute_dtype), wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())), **_DOT)
    g = pl.program_id(3)

    # cross-g accumulation in an fp32 VMEM scratch (g is the innermost grid
    # dim, so one (b,i,j) cell owns the scratch for its whole g sweep);
    # the output tile — which may be a bf16 residual stream — is written
    # once, at the last group, from the full-precision sum
    @pl.when(g == 0)
    def _init():
        acc_ref[:] = part + bproj_ref[0].astype(jnp.float32)

    @pl.when(g != 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(g == pl.num_programs(3) - 1)
    def _emit():
        out_ref[:] = acc_ref[:].reshape(Bb, 1, ws_h, 1, ws_w, C).astype(
            out_ref.dtype)


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

    # plan (G, Bb): G head-groups stream the weights in column/row blocks
    # (innermost grid dim, output accumulated in VMEM); Bb images at the
    # same window position share one LN/qkv/proj matmul (better MXU
    # M-tiling than per-window M=144). The VMEM byte model keeps the kernel
    # under the ~16 MB/core budget (guide: VMEM ~16 MB): fp32 intermediates
    # scale with Bb, the group's weight/bias blocks are resident (x2 for
    # Mosaic double buffering). Mosaic's scoped-stack check measured
    # 22.15 MB at stage-1 fp32 with the old token-count-only cap and
    # rejected it; G>1 is what admits stages 2-3 (C>=768) at all. Among
    # feasible plans, minimize G/Bb (fewer weight re-streams per token).
    G, Bb = _attn_plan(B, C, N, num_heads, compute_dtype, xr.dtype)
    if G is None:
        raise ValueError(
            f"no VMEM-feasible fusion plan for C={C}, heads={num_heads}")
    hg = num_heads // G
    Cg = C // G

    # pack the qkv columns per head group: (C, 3C) -> (G, C, 3Cg) with the
    # group's [q | k | v] column blocks contiguous (heads are column-major
    # inside q/k/v, so a group's heads are one contiguous slice each)
    wqkv_g = jnp.stack(
        [jnp.concatenate([wqkv[:, s * C + g * Cg:s * C + (g + 1) * Cg]
                          for s in range(3)], axis=1) for g in range(G)])
    # (G, 1, 3Cg): the singleton second-minor dim keeps the block's
    # last two dims equal to the array dims under Mosaic's mapping rule
    bqkv_g = jnp.stack(
        [jnp.concatenate([bqkv[s * C + g * Cg:s * C + (g + 1) * Cg]
                          for s in range(3)]) for g in range(G)])[:, None]

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
                        lambda b, i, j, g: (b, i, 0, j, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda b, i, j, g: (0, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads_per_group=hg,
                          compute_dtype=compute_dtype),
        grid=(B // Bb, nH, nW, G),
        interpret=interpret,
        in_specs=[
            tile,
            pl.BlockSpec((1, 1, ws, 1, ws, 1),
                         lambda b, i, j, g: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((1, C, 3 * Cg), lambda b, i, j, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3 * Cg), lambda b, i, j, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, N, N),
                         lambda b, i, j, g: ((i * nW + j) % nm, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cg, C), lambda b, i, j, g: (g, 0),
                         memory_space=pltpu.VMEM),
            vec(C),
        ],
        out_specs=tile,
        # output in the caller's residual-stream dtype (bf16 in the fast
        # mode — halves the stream's HBM round trip); the cross-g sum is
        # full fp32 in scratch either way
        out_shape=jax.ShapeDtypeStruct((B, nH, ws, nW, ws, C), xr.dtype),
        scratch_shapes=[pltpu.VMEM((Bb * N, C), jnp.float32)],
    )(x6, v6, ln_scale.reshape(1, C),
      ln_bias.reshape(1, C), wqkv_g, bqkv_g,
      bias_all.astype(jnp.float32), wproj, bproj.reshape(1, C))
    return out.reshape(B, Hp, Wp, C)


def _attn_plan(B: int, C: int, N: int, num_heads: int, compute_dtype,
               stream_dtype=jnp.float32, budget: int = 13 * 1024 * 1024):
    """(G, Bb) for `swin_attn_fused`, or (None, None) when nothing fits.

    Byte model per grid cell: resident group blocks (qkv columns + proj
    rows + group bias, x2 double buffering) + per-image intermediates:
    ~5 fp32 C-widths (x/y/scratch lumped) + stream-dtype in/out tiles +
    qkv/attn Cg-widths. At an fp32 stream this equals the round-4 model
    (7 fp32 C-widths); a bf16 stream frees 1 C-width -> larger Bb."""
    wbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    sbytes = 2 if stream_dtype == jnp.bfloat16 else 4
    best = None
    for G in range(1, num_heads + 1):
        # Cg is the sublane dim of the (Cg, C) wproj row block: Mosaic
        # requires 8-divisibility (the other group blocks' last two dims
        # equal their array dims and are always legal)
        if num_heads % G or C % G or (G > 1 and (C // G) % 8):
            continue
        Cg = C // G
        hg = num_heads // G
        resident = 2 * (3 * C * Cg * wbytes + Cg * C * wbytes
                        + hg * N * N * 4)
        per_img = (N * C * (4 * 5 + 2 * sbytes)
                   + N * Cg * (3 * (4 + wbytes) + 4))
        for Bb in range(B, 0, -1):
            if (B % Bb == 0 and Bb * N <= 1152 and Bb * hg <= 96
                    and resident + Bb * per_img <= budget):
                # Objective: minimize G/Bb. Round 5 tried maximize-Bb-
                # then-minimize-G (fewest weight re-streams: (8,4) over
                # (3,2) at stage 2) — measured WORSE on chip (stage2
                # 19.8 -> 23.7 ms, bench_swin_stages 2026-08-21): the
                # re-streams are hidden behind compute by double
                # buffering, while more groups add accumulation sweeps
                # and per-cell overhead. Keep G/Bb; do not re-attempt
                # without first profiling per-cell overhead.
                if best is None or G / Bb < best[0] / best[1]:
                    best = (G, Bb)
                break
    return best if best is not None else (None, None)


def _mlp_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref, acc_ref, *, compute_dtype):
    # hidden-group blocking (innermost grid dim g): gelu is elementwise
    # over the hidden axis, so z = sum_g gelu(LN(x) @ W1[:, g]) @ W2[g, :]
    # accumulates exactly in the fp32 scratch; residual + b2 fold in at
    # the ends and the (possibly bf16) output tile is written once.
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
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = z + b2_ref[0].astype(jnp.float32)

    @pl.when(g != 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + z

    @pl.when(g == pl.num_programs(1) - 1)
    def _emit():
        out_ref[:] = (x + acc_ref[:]).astype(out_ref.dtype)


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
    # plan (G, T): G hidden-groups stream W1 column / W2 row blocks
    # (innermost grid dim, output accumulated in VMEM); token tile T sized
    # to the same ~13 MB VMEM budget as the attention kernel. Prefer the
    # largest T (fewest weight re-streams), then the smallest G.
    G, T = _mlp_plan(n_tokens, C, hidden, compute_dtype, x.dtype)
    if G is None:
        raise ValueError(f"no VMEM-feasible MLP fusion plan for C={C}")
    Hg = hidden // G

    row = lambda a: pl.BlockSpec((T, a.shape[-1]), lambda t, g: (t, 0),
                                 memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda t, g: (0, 0),
                                 memory_space=pltpu.VMEM)
    w1 = w1.astype(compute_dtype)
    w2 = w2.astype(compute_dtype)
    return pl.pallas_call(
        functools.partial(_mlp_kernel, compute_dtype=compute_dtype),
        grid=(n_tokens // T, G),
        interpret=interpret,
        in_specs=[
            row(x), vec(C), vec(C),
            pl.BlockSpec((C, Hg), lambda t, g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hg), lambda t, g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, C), lambda t, g: (g, 0),
                         memory_space=pltpu.VMEM),
            vec(C),
        ],
        out_specs=row(x),
        out_shape=jax.ShapeDtypeStruct((n_tokens, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, C), jnp.float32)],
    )(x, ln_scale.reshape(1, C), ln_bias.reshape(1, C),
      w1, b1.reshape(1, hidden), w2, b2.reshape(1, C))


def _mlp_plan(n_tokens: int, C: int, hidden: int, compute_dtype,
              stream_dtype=jnp.float32, budget: int = 13 * 1024 * 1024):
    """(G, T) for `swin_mlp_fused`, or (None, None) when nothing fits.

    Byte model: resident W1/W2 group blocks (x2 double buffering) +
    per-token fp32 y/scratch (2C) + stream-dtype x/out tiles + the group's
    gelu hidden (Hg). At an fp32 stream this equals the round-4 model
    (x/y/z/out = 4 fp32 C-widths); a bf16 stream buys a larger T."""
    wbytes = 2 if compute_dtype == jnp.bfloat16 else 4
    sbytes = 2 if stream_dtype == jnp.bfloat16 else 4
    best = None
    for G in range(1, 64 + 1):
        # Hg is the lane dim of the (C, Hg) W1 column block / (1, Hg) b1
        # block: Mosaic requires 128-divisibility or the full array dim
        if hidden % G or (G > 1 and (hidden // G) % 128):
            continue
        Hg = hidden // G
        resident = 2 * 2 * C * Hg * wbytes
        per_tok = ((2 * C + Hg) * 4 + 2 * C * sbytes
                   + (C + Hg) * wbytes)
        avail = budget - resident
        if avail < 8 * per_tok:
            continue
        # T cap 512: the round-5 attempt to let T grow to 1024 (fewer
        # weight re-streams) measured worse alongside the attn plan change
        # (see note there) — streams are latency-hidden; bigger tiles gave
        # no win at production shapes.
        T = _token_tile(n_tokens, min(512, avail // per_tok))
        if best is None or (T, -G) > (best[1], -best[0]):
            best = (G, T)
    return best if best is not None else (None, None)


def fusable(dim: int, compute_dtype, window_size: int = 12) -> bool:
    """Static VMEM-budget gate: True when both group-blocked kernels have
    a feasible (G, ...) plan. With head/hidden-group weight streaming all
    Swin-L stages (C up to 1536) are admitted; the gate remains for other
    configs (tiny C with odd head counts, giant windows)."""
    N = window_size * window_size
    heads = max(dim // 32, 1)  # Swin-L: heads = C/32 at every stage
    sdt = jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32
    attn_g, _ = _attn_plan(1, dim, N, heads, compute_dtype, sdt)
    mlp_g, _ = _mlp_plan(4096, dim, 4 * dim, compute_dtype, sdt)
    return attn_g is not None and mlp_g is not None
