"""MSDeformAttn pixel decoder (flax.linen).

Reference: `mask2former/modeling/pixel_decoder/msdeformattn.py:23-358` — 1x1
input projections (+GroupNorm 32) on res3-5, 6 deformable-attention encoder
layers with level embeddings, then an FPN-style fusion down to 1/4-res mask
features.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import resize_bilinear
from mal_tpu.segment.msdeform import MSDeformAttn

Array = jax.Array


def _gn(name):
    return nn.GroupNorm(num_groups=32, name=name)


class DeformableEncoderLayer(nn.Module):
    d_model: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 3
    ffn_dim: int = 1024
    bf16_compute: bool = False  # fast mode: bf16 FFN + sampling matmuls

    @nn.compact
    def __call__(self, src: Array, pos: Array, reference_points: Array,
                 spatial_shapes) -> Array:
        dt = jnp.bfloat16 if self.bf16_compute else None
        q = src + pos
        attn = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points,
                            mxu_precision="bf16" if self.bf16_compute
                            else "high",
                            name="self_attn")(
            q, reference_points, src, spatial_shapes)
        src = nn.LayerNorm(name="norm1")(src + attn)
        y = nn.Dense(self.ffn_dim, dtype=dt, name="linear1")(src)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=dt, name="linear2")(y)
        return nn.LayerNorm(name="norm2")(src + y.astype(jnp.float32))


def position_embedding_sine(h: int, w: int, dim: int = 256,
                            temperature: int = 10000) -> Array:
    """Standard sine position encoding -> (h*w, dim)."""
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    eps = 1e-6
    scale = 2 * jnp.pi
    y_embed = ys / (h + eps) * scale
    x_embed = xs / (w + eps) * scale
    half = dim // 2
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = x_embed[..., None] / dim_t  # (1, w, half)
    pos_y = y_embed[..., None] / dim_t  # (h, 1, half)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(1, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, 1, half)
    pos = jnp.concatenate([jnp.broadcast_to(pos_y, (h, w, half)),
                           jnp.broadcast_to(pos_x, (h, w, half))], axis=-1)
    return pos.reshape(h * w, dim)


class MSDeformAttnPixelDecoder(nn.Module):
    d_model: int = 256
    num_layers: int = 6
    mask_dim: int = 256
    bf16_compute: bool = False

    @nn.compact
    def __call__(self, features: dict[str, Array]):
        """features: {"res2".."res5"} NHWC. Returns
        (mask_features (B, H/4, W/4, mask_dim), multi_scale [res5', res4', res3'])."""
        srcs = []
        shapes = []
        for i, key in enumerate(["res5", "res4", "res3"]):
            f = features[key]
            B, h, w, _ = f.shape
            x = nn.Conv(self.d_model, (1, 1), name=f"input_proj_{i}")(f)
            x = _gn(f"input_proj_gn_{i}")(x)
            srcs.append(x.reshape(B, h * w, self.d_model))
            shapes.append((h, w))

        level_embed = self.param("level_embed",
                                 nn.initializers.normal(1.0),
                                 (3, self.d_model))
        pos = [position_embedding_sine(h, w, self.d_model)[None]
               for (h, w) in shapes]
        pos_flat = jnp.concatenate(
            [p + level_embed[i][None, None] for i, p in enumerate(pos)], axis=1)
        src_flat = jnp.concatenate(srcs, axis=1)

        # reference points: per-level normalized pixel centers, broadcast to
        # every level (deformable DETR convention)
        ref_list = []
        for (h, w) in shapes:
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            ref_list.append(jnp.stack([gx, gy], -1).reshape(h * w, 2))
        refs = jnp.concatenate(ref_list, axis=0)  # (sum HW, 2)
        B = src_flat.shape[0]
        refs = jnp.broadcast_to(refs[None, :, None, :],
                                (B, refs.shape[0], 3, 2))

        y = src_flat
        for l in range(self.num_layers):
            y = DeformableEncoderLayer(self.d_model,
                                       bf16_compute=self.bf16_compute,
                                       name=f"layer_{l}")(
                y, pos_flat, refs, shapes)

        # split back to levels
        splits = [h * w for h, w in shapes]
        parts = jnp.split(y, [splits[0], splits[0] + splits[1]], axis=1)
        outs = [p.reshape(B, h, w, self.d_model)
                for p, (h, w) in zip(parts, shapes)]  # [res5', res4', res3']

        # FPN fusion with res2 -> mask features at 1/4
        r2 = features["res2"]
        lat = _gn("adapter_gn")(nn.Conv(self.d_model, (1, 1), use_bias=False,
                                        name="fpn_adapter")(r2))
        top = resize_bilinear(outs[-1], r2.shape[1], r2.shape[2])
        fused = lat + top
        fused = nn.relu(_gn("layer_gn")(nn.Conv(self.d_model, (3, 3),
                                                padding=((1, 1), (1, 1)),
                                                use_bias=False,
                                                name="fpn_conv")(fused)))
        # 1x1 conv, matching the reference (`msdeformattn.py:245-251`)
        mask_features = nn.Conv(self.mask_dim, (1, 1),
                                name="mask_features")(fused)
        return mask_features, outs
