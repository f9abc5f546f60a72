"""Semantic / panoptic inference + test-time augmentation for Mask2Former.

Reference: `mask2former/maskformer_model.py:280-342` (semantic_inference,
panoptic_inference) and `mask2former/test_time_augmentation.py:49-105`
(SemanticSegmentorWithTTA). MAL's runtime only consumes the *instance*
mode (`segment/mask2former.py:instance_inference`); these complete the
meta-architecture's inference surface.

TPU-native design notes:
- semantic_inference is one einsum, batched over B (the reference is
  per-image).
- panoptic_inference replaces the reference's per-segment Python loop +
  boolean indexing (`maskformer_model.py:286-342`) with a fixed-shape
  `lax.scan` over the Q queries, so it jits and vmaps: every query gets a
  validity bit instead of being dropped, and the sequential segment-id /
  stuff-merging semantics are reproduced exactly.
- TTA runs the model per (scale, flip) — distinct static shapes, one
  compile each — and averages the class probabilities at the original
  resolution, like `test_time_augmentation.py:83-99`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import resize_bilinear

Array = jax.Array


def semantic_inference(pred_logits: Array, pred_masks: Array) -> Array:
    """Class-probability semantic map (`maskformer_model.py:280-284`).

    pred_logits: (B, Q, K+1); pred_masks: (B, Q, h, w) mask logits.
    Returns (B, K, h, w): softmax class scores (background dropped) times
    mask sigmoids, summed over queries.
    """
    probs = jax.nn.softmax(pred_logits, axis=-1)[..., :-1]  # (B, Q, K)
    masks = jax.nn.sigmoid(pred_masks)  # (B, Q, h, w)
    return jnp.einsum("bqk,bqhw->bkhw", probs, masks)


class PanopticSeg(NamedTuple):
    """Fixed-shape panoptic output: the reference's (panoptic_seg,
    segments_info) list with one slot per query and a validity bit."""

    seg: Array       # (B, h, w) int32, 0 = void, else segment id
    ids: Array       # (B, Q) int32 segment id per query (0 = no segment)
    classes: Array   # (B, Q) int32 category per query
    isthing: Array   # (B, Q) bool
    valid: Array     # (B, Q) bool — True where a NEW segment was emitted
                     # (= one segments_info entry; stuff queries merged into
                     # an earlier segment paint pixels but stay False, like
                     # the reference's `continue` at maskformer_model.py:327)


def panoptic_inference(pred_logits: Array, pred_masks: Array,
                       thing_mask: Array,
                       object_mask_threshold: float = 0.8,
                       overlap_threshold: float = 0.8) -> PanopticSeg:
    """Fixed-shape panoptic inference (`maskformer_model.py:286-342`).

    pred_logits: (B, Q, K+1); pred_masks: (B, Q, h, w) mask logits;
    thing_mask: (K,) bool — True for "thing" classes (the reference reads
    this off dataset metadata, `maskformer_model.py:313`).

    Semantics reproduced exactly:
    - keep = argmax class != background AND score > object_mask_threshold;
    - pixels are assigned to the kept query maximizing score * sigmoid(mask);
    - a query emits a segment iff its assigned-and->=0.5 mask is non-empty
      and covers >= overlap_threshold of its full >=0.5 mask;
    - segment ids count up in query order; "stuff" queries of an
      already-emitted class merge into that class's first segment id.
    """
    B, Q, K1 = pred_logits.shape
    probs = jax.nn.softmax(pred_logits, axis=-1)
    scores = probs.max(axis=-1)  # (B, Q)
    labels = probs.argmax(axis=-1)  # (B, Q)
    keep = (labels != (K1 - 1)) & (scores > object_mask_threshold)

    sig = jax.nn.sigmoid(pred_masks)  # (B, Q, h, w)
    prob_masks = jnp.where(keep[:, :, None, None],
                           scores[:, :, None, None] * sig, -jnp.inf)
    # per-pixel winning query among kept ones (all -inf => 0, but then no
    # query passes `keep`, matching the reference's empty early-return)
    mask_ids = jnp.argmax(prob_masks, axis=1)  # (B, h, w)

    half = sig >= 0.5
    assigned = mask_ids[:, None] == jnp.arange(Q)[None, :, None, None]
    seg_mask = assigned & half  # (B, Q, h, w): the emitted segment pixels
    mask_area = assigned.sum(axis=(2, 3))  # (B, Q)
    original_area = half.sum(axis=(2, 3))
    seg_px = seg_mask.sum(axis=(2, 3))
    emit = (keep & (mask_area > 0) & (original_area > 0) & (seg_px > 0)
            & (mask_area >= overlap_threshold * original_area))

    isthing = thing_mask[jnp.clip(labels, 0, thing_mask.shape[0] - 1)]

    # sequential id assignment per image (vmapped over B)
    def per_image(emit_i, labels_i, isthing_i):
        def body(carry, q):
            next_id, first = carry
            lab = labels_i[q]
            e = emit_i[q]
            prev = first[lab]
            merge = e & (~isthing_i[q]) & (prev > 0)
            new = e & ~merge
            seg_id = jnp.where(merge, prev, jnp.where(new, next_id, 0))
            first = first.at[lab].set(
                jnp.where(new & (prev == 0), next_id, prev))
            next_id = next_id + new.astype(jnp.int32)
            return (next_id, first), (seg_id, new)

        init = (jnp.int32(1), jnp.zeros((K1,), jnp.int32))
        (_, _), (seg_ids, new_flags) = jax.lax.scan(body, init,
                                                    jnp.arange(Q))
        return seg_ids, new_flags  # (Q,), (Q,)

    ids, new = jax.vmap(per_image)(emit, labels, isthing)  # (B, Q)

    seg = jnp.sum(
        jnp.where(seg_mask, ids[:, :, None, None], 0), axis=1
    ).astype(jnp.int32)  # (B, h, w) — seg_mask slots are disjoint over Q

    return PanopticSeg(seg=seg, ids=ids.astype(jnp.int32),
                       classes=labels.astype(jnp.int32),
                       isthing=isthing, valid=new)


def semantic_tta(apply_fn: Callable[[Array], tuple[Array, Array]],
                 images: Array,
                 scales: Sequence[float] = (0.75, 1.0, 1.25),
                 flip: bool = True) -> Array:
    """Multi-scale + horizontal-flip TTA over the semantic probabilities
    (`test_time_augmentation.py:71-99` + detectron2's DatasetMapperTTA).

    apply_fn: images (B, H', W', 3) -> (pred_logits, pred_masks) — e.g.
    `lambda x: model.apply(variables, x)`. Returns the averaged (B, K, H, W)
    semantic probabilities at the input resolution. Each (scale, flip)
    variant is its own static shape (one XLA program per scale).
    """
    B, H, W = images.shape[:3]

    def snap(v: float) -> int:  # multiple-of-32 sizes keep Swin happy
        return max(32, int(round(v / 32.0)) * 32)

    total = None
    count = 0
    for s in scales:
        h, w = snap(H * s), snap(W * s)
        scaled = resize_bilinear(images, h, w)
        variants = [scaled] + ([scaled[:, :, ::-1]] if flip else [])
        for i, img in enumerate(variants):
            logits, masks = apply_fn(img)
            sem = semantic_inference(logits, masks)  # (B, K, h/4, w/4)
            sem = jnp.moveaxis(
                resize_bilinear(jnp.moveaxis(sem, 1, -1), H, W), -1, 1)
            if i == 1:  # un-flip
                sem = sem[..., ::-1]
            total = sem if total is None else total + sem
            count += 1
    return total / count
