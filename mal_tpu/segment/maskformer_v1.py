"""MaskFormer-v1 family: FPN pixel decoders, the DETR-style standard
transformer decoder, and the per-pixel baseline heads.

These are the reference's config-selectable alternatives to the Mask2Former
default stack (MSDeformAttn pixel decoder + masked transformer decoder):
- `mask2former/modeling/pixel_decoder/fpn.py:37-157` (BasePixelDecoder)
  and `:204-312` (TransformerEncoderPixelDecoder);
- `mask2former/modeling/transformer_decoder/
  maskformer_transformer_decoder.py:30-170` (StandardTransformerDecoder)
  over the DETR transformer (`transformer_decoder/transformer.py`);
- `mask2former/modeling/meta_arch/per_pixel_baseline.py:17-125`.

TPU-native notes: NHWC throughout, GroupNorm(32) like the reference's
`get_norm("GN")`, nearest top-down upsampling (exactly FPN), and the DETR
encoder/decoder as plain post-norm blocks reusing the parity-tested
`MultiheadAttention` from `segment/transformer_decoder.py`. Attention
dropout is omitted (the frozen/eval regime MAL uses; the reference trains
with dropout 0.1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import resize_bilinear
from mal_tpu.segment.pixel_decoder import position_embedding_sine
from mal_tpu.segment.transformer_decoder import MLP, MultiheadAttention

Array = jax.Array

_FEATURE_ORDER = ("res2", "res3", "res4", "res5")  # stride 4, 8, 16, 32


def _gn(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


def _upsample_nearest(x: Array, h: int, w: int) -> Array:
    """F.interpolate(mode="nearest") for integer scale factors (the FPN
    top-down path always doubles)."""
    h0, w0 = x.shape[1:3]
    return jnp.repeat(jnp.repeat(x, h // h0, axis=1), w // w0, axis=2)


class FPNPixelDecoder(nn.Module):
    """BasePixelDecoder (`fpn.py:37-157`): 1x1 lateral + 3x3 output convs
    (GN + ReLU), nearest top-down, 3x3 mask-features head. Returns
    (mask_features (B,H/4,W/4,mask_dim), transformer_features | None,
    multi_scale [coarse->fine, 3 levels])."""

    conv_dim: int = 256
    mask_dim: int = 256

    # hook for TransformerEncoderPixelDecoder: transform the coarsest level
    def _coarsest(self, x: Array) -> tuple[Array, Array | None]:
        y = _gn("layer_coarse_norm")(
            nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                    name="layer_coarse")(x))
        return nn.relu(y), None

    @nn.compact
    def __call__(self, features: dict[str, Array]):
        names = [f for f in _FEATURE_ORDER if f in features]
        multi_scale = []
        transformer_features = None
        y = None
        for idx, f in enumerate(reversed(names)):  # coarse -> fine
            x = features[f]
            if idx == 0:
                y, transformer_features = self._coarsest(x)
            else:
                lat = _gn(f"adapter_{f}_norm")(
                    nn.Conv(self.conv_dim, (1, 1), use_bias=False,
                            name=f"adapter_{f}")(x))
                y = lat + _upsample_nearest(y, x.shape[1], x.shape[2])
                y = nn.relu(_gn(f"layer_{f}_norm")(
                    nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                            name=f"layer_{f}")(y)))
            if len(multi_scale) < 3:  # maskformer_num_feature_levels
                multi_scale.append(y)
        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1,
                                name="mask_features")(y)
        return mask_features, transformer_features, multi_scale


class EncoderLayer(nn.Module):
    """DETR post-norm encoder layer (`transformer.py:TransformerEncoderLayer`,
    normalize_before=False), without dropout."""

    dim: int
    heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, src: Array, pos: Array) -> Array:
        q = src + pos
        y = MultiheadAttention(self.dim, self.heads, name="self_attn")(
            q, q, src)
        src = nn.LayerNorm(name="norm1")(src + y)
        y = nn.Dense(self.ffn_dim, name="linear1")(src)
        y = nn.Dense(self.dim, name="linear2")(nn.relu(y))
        return nn.LayerNorm(name="norm2")(src + y)


class DecoderLayer(nn.Module):
    """DETR post-norm decoder layer (`transformer.py:TransformerDecoderLayer`):
    query self-attention, cross-attention into the memory, FFN."""

    dim: int
    heads: int = 8
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, qpos: Array,
                 pos: Array) -> Array:
        q = tgt + qpos
        y = MultiheadAttention(self.dim, self.heads, name="self_attn")(
            q, q, tgt)
        tgt = nn.LayerNorm(name="norm1")(tgt + y)
        y = MultiheadAttention(self.dim, self.heads, name="cross_attn")(
            tgt + qpos, memory + pos, memory)
        tgt = nn.LayerNorm(name="norm2")(tgt + y)
        y = nn.Dense(self.ffn_dim, name="linear1")(tgt)
        y = nn.Dense(self.dim, name="linear2")(nn.relu(y))
        return nn.LayerNorm(name="norm3")(tgt + y)


class TransformerEncoderPixelDecoder(FPNPixelDecoder):
    """FPN + transformer encoder on the coarsest level (`fpn.py:204-312`);
    the encoded map is both the FPN top and the `transformer_features`
    handed to StandardTransformerDecoder."""

    enc_layers: int = 6
    heads: int = 8
    ffn_dim: int = 2048

    def _coarsest(self, x: Array) -> tuple[Array, Array]:
        B, h, w, _ = x.shape
        t = nn.Conv(self.conv_dim, (1, 1), name="input_proj")(x)
        pos = jnp.broadcast_to(
            position_embedding_sine(h, w, self.conv_dim)[None],
            (B, h * w, self.conv_dim))
        t = t.reshape(B, h * w, self.conv_dim)
        for i in range(self.enc_layers):
            t = EncoderLayer(self.conv_dim, self.heads, self.ffn_dim,
                             name=f"enc_{i}")(t, pos)
        t = t.reshape(B, h, w, self.conv_dim)
        y = _gn("layer_coarse_norm")(
            nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                    name="layer_coarse")(t))
        return nn.relu(y), t


class StandardTransformerDecoder(nn.Module):
    """`maskformer_transformer_decoder.py:30-170`: learned query embeddings
    through a DETR decoder over the transformer features; per-layer class +
    mask-embed heads for deep supervision (the reference's
    return_intermediate_dec)."""

    num_classes: int = 80
    hidden_dim: int = 256
    num_queries: int = 100
    dec_layers: int = 6
    heads: int = 8
    mask_dim: int = 256
    return_aux: bool = False

    @nn.compact
    def __call__(self, x: Array, mask_features: Array):
        """x: (B, h, w, C) transformer features (the coarsest level);
        mask_features: (B, H/4, W/4, mask_dim). Same output contract as
        MaskedTransformerDecoder: (logits (B,Q,K+1), masks (B,Q,H/4,W/4)),
        or stacked per-layer with `return_aux`."""
        B, h, w, C = x.shape
        Q = self.num_queries
        if C != self.hidden_dim:
            x = nn.Conv(self.hidden_dim, (1, 1), name="input_proj")(x)
            C = self.hidden_dim
        pos = jnp.broadcast_to(position_embedding_sine(h, w, C)[None],
                               (B, h * w, C))
        memory = x.reshape(B, h * w, C)

        query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                 (Q, C))
        qpos = jnp.broadcast_to(query_embed[None], (B, Q, C))
        tgt = jnp.zeros((B, Q, C))  # DETR decoder starts from zeros

        final_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_mlp = MLP(C, self.mask_dim, name="mask_embed")

        def predict(state):
            dec = final_norm(state)
            logits = class_embed(dec)
            emb = mask_mlp(dec)
            masks = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
            return logits, masks

        aux = []
        for i in range(self.dec_layers):
            tgt = DecoderLayer(C, self.heads, name=f"dec_{i}")(
                tgt, memory, qpos, pos)
            aux.append(predict(tgt))

        if self.return_aux:
            return (jnp.stack([a[0] for a in aux]),
                    jnp.stack([a[1] for a in aux]))
        return aux[-1]


class MaskFormerV1(nn.Module):
    """The original MaskFormer configuration (`per-paper` v1): Swin backbone
    -> TransformerEncoderPixelDecoder -> StandardTransformerDecoder. Shares
    the preprocessing and the (logits, masks) contract with `Mask2Former`,
    so `instance_inference` / `semantic_inference` / `panoptic_inference` /
    `semantic_tta` all apply unchanged."""

    num_classes: int = 80
    swin_size: str = "tiny"
    num_queries: int = 100
    bgr_input: bool = True

    @nn.compact
    def __call__(self, images: Array, return_aux: bool = False):
        from mal_tpu.segment.mask2former import preprocess_images
        from mal_tpu.segment.swin import SwinTransformer

        x = preprocess_images(images, self.bgr_input)
        feats = SwinTransformer(self.swin_size, name="backbone")(x)
        mask_features, t_feats, _ = TransformerEncoderPixelDecoder(
            name="pixel_decoder")(feats)
        return StandardTransformerDecoder(
            num_classes=self.num_classes, num_queries=self.num_queries,
            return_aux=return_aux, name="predictor")(t_feats, mask_features)


class PerPixelBaselineHead(nn.Module):
    """`per_pixel_baseline.py:17-125`: pixel decoder + 1x1 class predictor,
    bilinearly upsampled x4; cross-entropy with ignore label for training."""

    num_classes: int = 80
    ignore_value: int = -1
    loss_weight: float = 1.0
    transformer_enc: bool = False  # the "Plus" variant's pixel decoder

    @nn.compact
    def __call__(self, features: dict[str, Array]) -> Array:
        cls = (TransformerEncoderPixelDecoder if self.transformer_enc
               else FPNPixelDecoder)
        mask_features, _, _ = cls(name="pixel_decoder")(features)
        logits = nn.Conv(self.num_classes, (1, 1), name="predictor")(
            mask_features)  # (B, H/4, W/4, K)
        B, h, w, K = logits.shape
        return resize_bilinear(logits, h * 4, w * 4)  # common_stride=4

    @staticmethod
    def loss(logits: Array, targets: Array, ignore_value: int = -1,
             loss_weight: float = 1.0) -> Array:
        """Mean cross-entropy over non-ignored pixels
        (`per_pixel_baseline.py:117-124`). logits (B,H,W,K) from __call__;
        targets (B,H,W) int."""
        valid = targets != ignore_value
        tgt = jnp.clip(targets, 0, logits.shape[-1] - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return loss_weight * (jnp.where(valid, nll, 0.0).sum()
                              / jnp.maximum(valid.sum(), 1))
