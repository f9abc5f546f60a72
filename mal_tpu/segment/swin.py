"""Swin Transformer backbone (flax.linen, NHWC).

From-scratch implementation of the Swin-T/S/B/L backbone used by the frozen
Mask2Former front-end (`mask2former/modeling/backbone/swin.py:21-770`):
patch embedding, windowed + shifted-window attention with relative position
bias, patch merging, per-stage LayerNorm outputs for the FPN/pixel-decoder.

TPU notes: window partitioning is pure reshape/transpose (no gathers); the
attention is batched over (windows x heads) and maps straight onto the MXU.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


CONFIGS = {
    # embed_dim, depths, num_heads, window
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    "large": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
}


def window_partition(x: Array, ws: int) -> Array:
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C). H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(wins: Array, ws: int, H: int, W: int) -> Array:
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """Windowed MSA. On TPU the scores/bias/mask/softmax/@v chain runs as
    ONE fused Pallas kernel per window (scores never touch HBM —
    `mal_tpu/ops/pallas/window_attention.py`; the XLA einsum path, kept for
    CPU tests and as the equivalence reference, materializes the
    (nW, h, N, N) score tensor and is ~4x slower per Swin-L layer)."""

    dim: int
    num_heads: int
    window_size: int
    use_fused: bool | None = None  # None = auto (fused on TPU backends)
    compute_dtype: object = None   # e.g. jnp.bfloat16 for MXU-rate matmuls

    @nn.compact
    def __call__(self, x: Array, mask: Array | None = None) -> Array:
        """x: (nW, N, C) windows; mask: (numWin, N, N) or None."""
        nW, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim ** -0.5

        dt = self.compute_dtype
        qkv = nn.Dense(3 * C, dtype=dt, name="qkv")(x).reshape(
            nW, N, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (nW, N, h, d)

        rpb_table = self.param(
            "relative_position_bias_table", nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h))
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, h)
        bias = bias.transpose(2, 0, 1)  # (h, N, N)

        fused = self.use_fused
        if fused is None:
            fused = jax.default_backend() == "tpu"

        if fused:
            from mal_tpu.ops.pallas.window_attention import (
                window_attention_fused)

            if mask is not None:
                nm = mask.shape[0]
                bias_all = bias[None] + mask[:, None]          # (nm, h, N, N)
            else:
                nm = 1
                bias_all = bias[None]
            out = window_attention_fused(
                jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1),
                jnp.moveaxis(v, 2, 1), bias_all.astype(jnp.float32),
                num_wins_per_image=nm)
            out = jnp.moveaxis(out, 1, 2).astype(dt or x.dtype)
            return nn.Dense(C, dtype=dt, name="proj")(
                out.reshape(nW, N, C)).astype(x.dtype)

        attn = jnp.einsum("wnhd,wmhd->whnm", q * scale, k)
        attn = attn + bias[None]
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.reshape(nW // nm, nm, h, N, N) + mask[None, :, None]
            attn = attn.reshape(nW, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)

        out = jnp.einsum("whnm,wmhd->wnhd", attn.astype(v.dtype),
                         v).reshape(nW, N, C)
        return nn.Dense(C, dtype=dt, name="proj")(out).astype(x.dtype)


class _DenseParams(nn.Module):
    """Parameter mirror of `nn.Dense` (same names, shapes, initializers)
    for the fused-block path: creates the params without emitting the XLA
    matmul, so `fused_block=True` keeps the checkpoint tree identical."""
    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.linear.default_kernel_init, self.shape)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.shape[1],))
        return k, b


class _LNParams(nn.Module):
    """Parameter mirror of `nn.LayerNorm` (the fused kernels apply the
    normalization in-kernel with flax's epsilon)."""
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.dim,))
        return s, b


class _AttnParams(nn.Module):
    """Parameter mirror of `WindowAttention` for the fused-block path."""
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self):
        qkv = _DenseParams((self.dim, 3 * self.dim), name="qkv")()
        rpb = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        proj = _DenseParams((self.dim, self.dim), name="proj")()
        return qkv, rpb, proj


class SwinBlock(nn.Module):
    """One Swin block with a *traced* shift flag so a whole stage can run
    under `nn.scan` (identical structure for W-MSA and SW-MSA blocks: the
    shift roll is by `flag * ws//2` and the additive attention mask is the
    shift mask scaled by the flag — exact for both cases).

    `fused_block=True` runs the whole block as two Pallas kernels
    (LN1+qkv+attention+proj per window tile, LN2+MLP token-tiled —
    `ops/pallas/swin_block.py`), eliminating the partition/reverse
    relayouts and intermediate HBM round-trips. Forward-only (frozen
    segmenter); parameter tree identical to the unfused path."""
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    compute_dtype: object = None
    train: bool = False
    fused_block: bool = False

    @nn.compact
    def __call__(self, x: Array, shift_flag: Array,
                 drop_rate: Array | None = None) -> Array:
        """x: (B, H, W, C); shift_flag: () 0.0 or 1.0. Pads internally to
        window multiples (like the reference, `swin.py` W-MSA forward).
        `drop_rate`: per-block stochastic-depth probability (training;
        the reference's timm DropPath on both residual branches,
        `backbone/swin.py:292-293`)."""
        B, H, W, C = x.shape

        def drop_path(y):
            if not self.train or drop_rate is None:
                return y
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(
                self.make_rng("droppath"), keep, (B, 1, 1, 1))
            return y * mask.astype(y.dtype) / keep
        ws = self.window_size
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
        shift = ws // 2 if min(Hp, Wp) > ws else 0
        roll = (-jnp.asarray(shift) * shift_flag).astype(jnp.int32)

        if self.fused_block and not self.train:
            from mal_tpu.ops.pallas.swin_block import (
                swin_attn_fused, swin_mlp_fused)

            # parameter mirrors — tree identical to the unfused branch
            ln1_s, ln1_b = _LNParams(C, name="norm1")()
            (qkv_k, qkv_b), rpb, (proj_k, proj_b) = _AttnParams(
                self.dim, self.num_heads, ws, name="attn")()
            ln2_s, ln2_b = _LNParams(C, name="norm2")()
            hidden = int(C * self.mlp_ratio)
            fc1_k, fc1_b = _DenseParams((C, hidden), name="mlp_fc1")()
            fc2_k, fc2_b = _DenseParams((hidden, C), name="mlp_fc2")()

            idx = jnp.asarray(relative_position_index(ws))
            N = ws * ws
            bias = rpb[idx.reshape(-1)].reshape(N, N, self.num_heads)
            bias = bias.transpose(2, 0, 1)[None]            # (1, h, N, N)
            if shift > 0:
                mask = _shift_mask(Hp, Wp, ws, shift) * shift_flag
                bias_all = bias + mask[:, None]             # (nm, h, N, N)
            else:
                bias_all = bias

            xr = x
            valid = jnp.ones((H, W), jnp.float32)
            if (Hp, Wp) != (H, W):
                xr = jnp.pad(xr, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
                valid = jnp.pad(valid, ((0, Hp - H), (0, Wp - W)))
            xr = jnp.roll(xr, (roll, roll), axis=(1, 2))
            valid = jnp.roll(valid, (roll, roll), axis=(0, 1))

            cdt = self.compute_dtype or jnp.float32
            interp = jax.default_backend() != "tpu"
            attn = swin_attn_fused(
                xr, valid, ln1_s, ln1_b, qkv_k, qkv_b, bias_all,
                proj_k, proj_b, window_size=ws, num_heads=self.num_heads,
                compute_dtype=cdt, interpret=interp)
            y = jnp.roll(attn, (-roll, -roll), axis=(1, 2))[:, :H, :W]
            x2 = x + y.astype(x.dtype)
            out = swin_mlp_fused(
                x2.reshape(-1, C), ln2_s, ln2_b, fc1_k, fc1_b, fc2_k,
                fc2_b, compute_dtype=cdt, interpret=interp)
            return out.reshape(B, H, W, C).astype(x.dtype)

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if (Hp, Wp) != (H, W):
            y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        y = jnp.roll(y, (roll, roll), axis=(1, 2))
        attn_mask = (_shift_mask(Hp, Wp, ws, shift) * shift_flag
                     if shift > 0 else None)
        wins = window_partition(y, ws).reshape(-1, ws * ws, C)
        wins = WindowAttention(self.dim, self.num_heads, ws,
                               compute_dtype=self.compute_dtype,
                               name="attn")(wins, attn_mask)
        y = window_reverse(wins.reshape(-1, ws, ws, C), ws, Hp, Wp)
        y = jnp.roll(y, (-roll, -roll), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + drop_path(y)

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.compute_dtype,
                     name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(C, dtype=self.compute_dtype, name="mlp_fc2")(y)
        return x + drop_path(y.astype(x.dtype))


class SwinStage(nn.Module):
    """All blocks of one resolution stage as ONE scanned block with stacked
    parameters — Swin-L's 18-block stage 2 becomes a single program block
    (compile time and HLO size drop ~an order of magnitude vs unrolling;
    semantics identical to the reference's sequential blocks)."""
    dim: int
    num_heads: int
    window_size: int
    depth: int
    compute_dtype: object = None
    train: bool = False
    fused_block: bool = False
    drop_rates: tuple = ()   # per-block stochastic-depth probabilities

    @nn.compact
    def __call__(self, x: Array) -> Array:
        flags = jnp.asarray(
            [0.0 if b % 2 == 0 else 1.0 for b in range(self.depth)])
        rates = jnp.asarray(self.drop_rates or [0.0] * self.depth)

        def body(block, carry, scanned_in):
            flag, rate = scanned_in
            return block(carry, flag, rate), None

        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "droppath": True},
            length=self.depth,
        )
        y, _ = scanned(
            SwinBlock(self.dim, self.num_heads, self.window_size,
                      compute_dtype=self.compute_dtype, train=self.train,
                      fused_block=self.fused_block, name="blocks"),
            x, (flags, rates))
        return y


def _shift_mask(H: int, W: int, ws: int, shift: int) -> Array:
    img_mask = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wslice in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wslice, :] = cnt
            cnt += 1
    wins = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


class PatchMerging(nn.Module):
    dim: int
    compute_dtype: object = None  # bf16 keeps the fast-mode stream bf16
                                  # across the stage boundary (params fp32)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        # channel order must match the official Swin's cat([x0, x1, x2, x3])
        # = [(0,0), (1,0), (0,1), (1,1)] row/col parities, or converted
        # `reduction`/`norm` weights would be silently permuted
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.compute_dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Returns {"res2", "res3", "res4", "res5"} NHWC feature maps.

    `bf16_compute=True` runs every Dense matmul (qkv/proj/MLP) in bfloat16
    at full MXU rate (params stay fp32; residual stream and LayerNorms stay
    fp32; the fused attention kernel accumulates scores in fp32 either
    way). Off by default: the frozen-eval temporal hint and converter
    parity tests use exact fp32.
    """
    size: str = "large"
    bf16_compute: bool = False
    fused_block: bool = False  # whole-block Pallas fusion (frozen eval;
                               # ops/pallas/swin_block.py); applied per
                               # stage where the weights fit VMEM
    drop_path_rate: float = 0.0  # reference trains Swin-L with 0.3
                                 # (`mask2former/config.py:86`), linspace-
                                 # scheduled over all blocks (`swin.py:584`)

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 max_stage: int = 4) -> dict[str, Array]:
        """`max_stage < 4` stops after that many stages (prefix timing —
        benchmarks/bench_swin_stages.py); parameters for skipped stages
        are simply not touched."""
        embed_dim, depths, heads, ws = CONFIGS[self.size]
        dpr = np.linspace(0.0, self.drop_path_rate, sum(depths))
        B, H, W, _ = x.shape
        assert H % 32 == 0 and W % 32 == 0

        # patch embed: 4x4 conv. (A patch-reshape + matmul reformulation
        # measured within noise of the conv — the prefix's absolute cost is
        # mostly the tunnel dispatch floor, bench_swin_stages.py — so the
        # simpler conv stays.)
        y = nn.Conv(embed_dim, (4, 4), strides=(4, 4), name="patch_embed")(x)
        y = nn.LayerNorm(name="patch_norm")(y)

        outs = {}
        if max_stage == 0:
            outs["patch"] = y        # patch-embed-only prefix
        dim = embed_dim
        cdt = jnp.bfloat16 if self.bf16_compute else None
        block0 = 0
        for stage in range(max_stage):
            from mal_tpu.ops.pallas.swin_block import fusable
            fused = self.fused_block and fusable(dim, cdt) and not train
            # fast-mode fused stages carry the residual stream in bf16
            # (the reference evaluates the frozen segmenter under autocast,
            # `manydepth/trainer.py:573` — an fp16 stream — so a bf16
            # stream is faithful); it halves every stream HBM pass and the
            # fused kernels still accumulate cross-group sums in fp32.
            # LayerNorm outputs (`out_norm*`) promote back to fp32 for the
            # pixel decoder; the exact-fp32 parity path is untouched.
            bf16_stream = fused and cdt == jnp.bfloat16
            if bf16_stream:
                y = y.astype(jnp.bfloat16)
            y = SwinStage(dim, heads[stage], ws, depths[stage],
                          compute_dtype=cdt, train=train,
                          fused_block=fused,
                          drop_rates=tuple(
                              dpr[block0:block0 + depths[stage]]),
                          name=f"stage{stage}")(y)
            block0 += depths[stage]
            out = nn.LayerNorm(name=f"out_norm{stage}")(y)
            outs[f"res{stage + 2}"] = jnp.asarray(out, jnp.float32)
            if stage < 3:
                y = PatchMerging(dim, compute_dtype=cdt if bf16_stream
                                 else None, name=f"merge{stage}")(y)
                dim *= 2
        return outs
