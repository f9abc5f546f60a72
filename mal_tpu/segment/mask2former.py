"""Mask2Former meta-architecture + instance inference (flax.linen).

Reference: `mask2former/maskformer_model.py:21-380`. Used frozen, in eval
mode, inside MAL training as the temporal hint's instance segmenter
(`manydepth/trainer.py:350-357`). Instance inference
(`maskformer_model.py:344-380`): softmax class scores, flattened top-k over
(queries x classes), mask > 0 binarization, mask-probability-weighted scores
— here with a *fixed* top-k = `max_instances` into the padded `Instances`
layout instead of variable-length detectron2 structures.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import resize_bilinear
from mal_tpu.segment.instances import Instances
from mal_tpu.segment.pixel_decoder import MSDeformAttnPixelDecoder
from mal_tpu.segment.swin import SwinTransformer
from mal_tpu.segment.transformer_decoder import MaskedTransformerDecoder

Array = jax.Array

# detectron2 COCO normalization (cfg MODEL.PIXEL_MEAN / PIXEL_STD), applied
# to [0,255] inputs
_PIXEL_MEAN = jnp.asarray([123.675, 116.28, 103.53])
_PIXEL_STD = jnp.asarray([58.395, 57.12, 57.375])


def preprocess_images(images: Array, bgr_input: bool = True) -> Array:
    """Reference-exact segmenter preprocessing.

    The reference feeds Mask2Former **BGR** frames (`manydepth/dyn_utils.py:
    176-178` permutes [2,1,0] before x255) while detectron2 then normalizes
    with the config's RGB-ordered means (`maskformer_model.py:193-195`) —
    a channel/mean mismatch that is part of the released models' observed
    behavior, so it is reproduced here verbatim (bgr_input=True, the
    default). Set bgr_input=False for the color-correct variant.
    """
    if bgr_input:
        images = images[..., ::-1]
    return (images * 255.0 - _PIXEL_MEAN) / _PIXEL_STD


def resolve_fused_swin(cfg) -> bool:
    """Resolve `Config.seg_fused_swin` (None = auto) for the frozen
    segmenter: on TPU in fast-training mode (bf16 trunks) the whole-block
    Pallas Swin kernels (group-blocked: all four Swin-L stages fuse)
    measured backbone 78.8 -> 44.1 ms / seg_fn
    148.9 -> 114.2 ms with 0.07% mask-bit deviation
    (benchmarks/bench_swin_fused.py, HISTORY.md), so auto = on there; off
    the TPU they run in slow interpret mode, and in exact fp32 mode the
    unfused path stays reference-exact, so auto = off for both."""
    if cfg.seg_fused_swin is not None:
        return cfg.seg_fused_swin
    import jax

    return (jax.default_backend() == "tpu"
            and cfg.compute_dtype == "bfloat16")


class Mask2Former(nn.Module):
    num_classes: int = 80
    swin_size: str = "large"
    num_queries: int = 100
    max_instances: int = 16
    score_threshold: float = 0.0
    bgr_input: bool = True  # reference feeds BGR (`dyn_utils.py:176-178`)
    bf16_backbone: bool = False  # bf16 Swin + pixel-decoder matmuls
                                 # (SwinTransformer / MSDeformAttnPixelDecoder)
    fused_swin: bool = False     # whole-block Pallas Swin fusion (frozen
                                 # eval forward — ops/pallas/swin_block.py)
    drop_path_rate: float = 0.3  # train-mode stochastic depth
                                 # (`mask2former/config.py:86`)

    @nn.compact
    def __call__(self, images: Array, return_aux: bool = False,
                 train: bool = False) -> tuple[Array, Array]:
        """images: (B, H, W, 3) in [0, 1] RGB.
        Returns (pred_logits (B, Q, K+1), pred_masks (B, Q, H/4, W/4));
        with `return_aux`, stacked per-decoder-layer predictions for deep
        supervision (see MaskedTransformerDecoder). `train=True` enables
        Swin stochastic depth (requires a "droppath" rng)."""
        x = preprocess_images(images, self.bgr_input)
        feats = SwinTransformer(self.swin_size,
                                bf16_compute=self.bf16_backbone,
                                fused_block=self.fused_swin and not train,
                                drop_path_rate=self.drop_path_rate,
                                name="backbone")(x, train=train)
        mask_features, multi_scale = MSDeformAttnPixelDecoder(
            bf16_compute=self.bf16_backbone,
            name="pixel_decoder")(feats)
        logits, masks = MaskedTransformerDecoder(
            num_classes=self.num_classes, num_queries=self.num_queries,
            return_aux=return_aux,
            name="predictor")(multi_scale, mask_features)
        return logits, masks


def instance_inference(pred_logits: Array, pred_masks: Array,
                       out_h: int, out_w: int, max_instances: int = 16,
                       mask_threshold: float = 0.0) -> Instances:
    """Top-k padded instances (`maskformer_model.py:344-380`).

    pred_logits: (B, Q, K+1); pred_masks: (B, Q, h, w).
    Scores are class-softmax (background dropped), flattened over (Q x K),
    fixed top-`max_instances`; final score is multiplied by the mean in-mask
    probability.
    """
    B, Q, K1 = pred_logits.shape
    K = K1 - 1
    scores = jax.nn.softmax(pred_logits, axis=-1)[..., :K]  # (B, Q, K)
    flat = scores.reshape(B, Q * K)
    top_scores, top_idx = jax.lax.top_k(flat, max_instances)
    top_q = top_idx // K
    top_class = top_idx % K

    masks = jnp.take_along_axis(
        pred_masks, top_q[:, :, None, None], axis=1)  # (B, N, h, w)
    # upsample logits to the requested output size, then binarize
    masks_up = resize_bilinear(jnp.moveaxis(masks, 1, -1), out_h, out_w)
    masks_up = jnp.moveaxis(masks_up, -1, 1)
    binary = (masks_up > mask_threshold).astype(jnp.float32)

    prob = jax.nn.sigmoid(masks_up)
    mask_score = (jnp.sum(prob * binary, axis=(2, 3))
                  / (jnp.sum(binary, axis=(2, 3)) + 1e-6))
    final_scores = top_scores * mask_score

    return Instances(
        masks=binary,
        classes=top_class.astype(jnp.int32),
        scores=final_scores,
        valid=jnp.ones_like(final_scores, bool),
    )


def mask2former_train_loss(model: Mask2Former, params, images: Array,
                           tgt_labels: Array, tgt_masks: Array,
                           tgt_valid: Array, key: Array,
                           criterion_cfg=None) -> tuple[Array, dict]:
    """Fine-tuning objective: deep-supervised Hungarian set losses — the
    training path of `maskformer_model.py:198-216` (criterion over final +
    aux predictions, weighted sum). Returns (total, per-term dict).

    images (B, H, W, 3) in [0,1]; targets padded to a static T with
    `tgt_valid` (see `segment/criterion.py`). Gradable w.r.t. `params`.
    """
    from mal_tpu.segment.criterion import (CriterionConfig,
                                           set_criterion_deep, weight_dict,
                                           weighted_total)

    cfg = criterion_cfg or CriterionConfig(num_classes=model.num_classes)
    key, kd = jax.random.split(key)
    logits, masks = model.apply(params, images, return_aux=True, train=True,
                                rngs={"droppath": kd})
    losses = set_criterion_deep(key, logits, masks, tgt_labels, tgt_masks,
                                tgt_valid, cfg)
    total = weighted_total(losses, weight_dict(cfg, logits.shape[0] - 1))
    return total, losses


def make_seg_fn(model: Mask2Former, variables=None, max_instances: int = 16,
                mask_threshold: float = 0.0):
    """Build the `seg_fn(seg_variables, images) -> Instances` used by the
    temporal hint.

    The weights are an explicit ARGUMENT, not a closure: closing over the
    ~200M-param Swin-L pytree embeds it as program constants in the jitted
    train step (gigabyte HLO uploads; remote compile services reject them).
    `variables` here is only a fallback used when the call passes None.
    """

    def seg_fn(seg_variables, images: Array) -> Instances:
        v = seg_variables if seg_variables is not None else variables
        H, W = images.shape[1:3]
        logits, masks = model.apply(v, images)
        logits = jax.lax.stop_gradient(logits)
        masks = jax.lax.stop_gradient(masks)
        return instance_inference(logits, masks, H, W, max_instances,
                                  mask_threshold)

    return seg_fn
