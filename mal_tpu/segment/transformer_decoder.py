"""Masked transformer decoder (Mask2Former).

Reference: `mask2former/modeling/transformer_decoder/
mask2former_transformer_decoder.py:363-447` — 100 learned queries, 9 layers
cycling over the 3 pixel-decoder scales, *masked* cross-attention (the
attention mask comes from the previous layer's mask prediction, thresholded
at 0.5), self-attention, FFN, and per-layer class + mask-embed heads.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import resize_bilinear
from mal_tpu.segment.pixel_decoder import position_embedding_sine

Array = jax.Array


class MultiheadAttention(nn.Module):
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 mask: Array | None = None) -> Array:
        """q: (B, Nq, C); k/v: (B, Nk, C); mask: (B, Nq, Nk) additive or None."""
        B, Nq, C = q.shape
        h = self.heads
        d = C // h
        qh = nn.Dense(C, name="q")(q).reshape(B, Nq, h, d)
        kh = nn.Dense(C, name="k")(k).reshape(B, -1, h, d)
        vh = nn.Dense(C, name="v")(v).reshape(B, -1, h, d)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(d)
        if mask is not None:
            attn = attn + mask[:, None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Nq, C)
        return nn.Dense(C, name="out")(out)


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"fc{i}")(x))
        return nn.Dense(self.out, name=f"fc{self.layers - 1}")(x)


class MaskedTransformerDecoder(nn.Module):
    num_classes: int = 80
    hidden_dim: int = 256
    num_queries: int = 100
    num_layers: int = 9          # 3 rounds over 3 scales
    num_heads: int = 8
    mask_dim: int = 256
    return_aux: bool = False     # deep supervision (training)

    @nn.compact
    def __call__(self, multi_scale: list[Array], mask_features: Array):
        """multi_scale: [res5', res4', res3'] from the pixel decoder;
        mask_features: (B, H/4, W/4, mask_dim).
        Returns (pred_logits (B, Q, K+1), pred_masks (B, Q, H/4, W/4)); with
        `return_aux`, stacked per-layer predictions
        ((L+1, B, Q, K+1), (L+1, B, Q, H/4, W/4)) — the initial pre-layer
        prediction plus one per decoder layer, final last, exactly the
        deep-supervision set the reference trains on
        (`mask2former_transformer_decoder.py:390-430` predictions_class /
        predictions_mask)."""
        B = mask_features.shape[0]
        Q = self.num_queries
        C = self.hidden_dim

        query_feat = self.param("query_feat", nn.initializers.normal(1.0),
                                (Q, C))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (Q, C))
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (3, C))

        srcs, poss, shapes = [], [], []
        for i, f in enumerate(multi_scale):
            _, h, w, _ = f.shape
            srcs.append(f.reshape(B, h * w, C) + level_embed[i][None, None])
            poss.append(jnp.broadcast_to(
                position_embedding_sine(h, w, C)[None], (B, h * w, C)))
            shapes.append((h, w))

        output = jnp.broadcast_to(query_feat[None], (B, Q, C))
        qpos = jnp.broadcast_to(query_embed[None], (B, Q, C))

        # shared prediction heads (one instance, reused per layer)
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_mlp = MLP(C, self.mask_dim, name="mask_embed")

        # Bilinear resize is linear in the pixels, so it commutes with the
        # mask einsum: resize(Σ_c e_c F_c) = Σ_c e_c resize(F_c). The
        # reference computes each layer's full-res masks and interpolates
        # them down for the attention mask
        # (`mask2former_transformer_decoder.py:433-440`); computing the
        # attention logits directly against per-level pre-resized
        # mask_features is mathematically identical (up to fp summation
        # order) and lets XLA drop the 10 per-layer full-res (Q x H/4*W/4
        # x C) einsums entirely in eval mode, where only the final masks
        # are returned.
        feats_at = {
            (h, w): resize_bilinear(mask_features, h, w)
            for (h, w) in dict.fromkeys(shapes)}

        def predict(output, attn_h, attn_w):
            dec_out = decoder_norm(output)
            logits = class_embed(dec_out)
            mask_embed = mask_mlp(dec_out)
            masks = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)
            # attention mask at the next level's resolution: True = masked out.
            # Computed as einsum-vs-resized-features (the reference resizes
            # the full-res mask logits instead); exact only up to fp summation
            # order, and it feeds the discontinuous sigmoid<0.5 threshold —
            # logits ~0 can flip a boundary element vs the reference. If a
            # parity oracle ever flakes at a mask boundary, suspect this
            # order-of-ops difference first (atol 3e-4/3e-3 passes today).
            m = jnp.einsum("bqc,bhwc->bqhw", mask_embed,
                           feats_at[(attn_h, attn_w)])
            attn_mask = (nn.sigmoid(m.reshape(B, Q, -1)) < 0.5)
            # if a query masks everything, unmask it (`:433-447`)
            all_masked = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.where(all_masked, False, attn_mask)
            return logits, masks, jnp.where(attn_mask, -1e4, 0.0)

        h0, w0 = shapes[0]
        logits, masks, attn_mask = predict(output, h0, w0)
        aux = [(logits, masks)]

        for l in range(self.num_layers):
            lvl = l % 3
            src, pos = srcs[lvl], poss[lvl]
            # masked cross-attention first (Mask2Former ordering)
            y = MultiheadAttention(C, self.num_heads, name=f"xattn_{l}")(
                output + qpos, src + pos, src, attn_mask)
            output = nn.LayerNorm(name=f"xnorm_{l}")(output + y)
            # self-attention
            y = MultiheadAttention(C, self.num_heads, name=f"sattn_{l}")(
                output + qpos, output + qpos, output)
            output = nn.LayerNorm(name=f"snorm_{l}")(output + y)
            # FFN
            y = nn.Dense(2048, name=f"ffn1_{l}")(output)
            y = nn.relu(y)
            y = nn.Dense(C, name=f"ffn2_{l}")(y)
            output = nn.LayerNorm(name=f"fnorm_{l}")(output + y)

            nh, nw = shapes[(l + 1) % 3]
            logits, masks, attn_mask = predict(output, nh, nw)
            aux.append((logits, masks))

        if self.return_aux:
            return (jnp.stack([a[0] for a in aux]),
                    jnp.stack([a[1] for a in aux]))
        return logits, masks
