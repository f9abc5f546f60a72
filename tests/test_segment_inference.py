"""Semantic / panoptic inference + TTA (`mal_tpu/segment/inference.py`).

Oracle: a line-by-line numpy transcription of the reference's
`mask2former/maskformer_model.py:280-342` (semantic_inference +
panoptic_inference's sequential segment loop, incl. stuff merging and the
overlap-threshold rejection), run against the fixed-shape lax.scan version
on inputs crafted to hit every branch.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mal_tpu.segment.inference import (PanopticSeg, panoptic_inference,
                                       semantic_inference, semantic_tta)

B, Q, K, H4, W4 = 2, 12, 6, 16, 24


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _ref_semantic(logits, masks):
    # maskformer_model.py:280-284 (per image)
    probs = _softmax(logits)[..., :-1]
    sig = _sigmoid(masks)
    return np.einsum("qk,qhw->khw", probs, sig)


def _ref_panoptic(logits, masks, thing_ids, obj_thr=0.8, ovl_thr=0.8):
    """Transcription of maskformer_model.py:286-342 for ONE image."""
    probs = _softmax(logits)
    scores, labels = probs.max(-1), probs.argmax(-1)
    sig = _sigmoid(masks)
    keep = (labels != logits.shape[-1] - 1) & (scores > obj_thr)

    cur_scores, cur_classes = scores[keep], labels[keep]
    cur_masks = sig[keep]
    panoptic = np.zeros(masks.shape[-2:], np.int32)
    segments = []  # (id, isthing, category)
    if cur_masks.shape[0] == 0:
        return panoptic, segments
    cur_prob = cur_scores[:, None, None] * cur_masks
    cur_ids = cur_prob.argmax(0)
    current = 0
    stuff_memory = {}
    for k in range(cur_classes.shape[0]):
        pred_class = int(cur_classes[k])
        isthing = pred_class in thing_ids
        mask_area = int((cur_ids == k).sum())
        original_area = int((cur_masks[k] >= 0.5).sum())
        mask = (cur_ids == k) & (cur_masks[k] >= 0.5)
        if mask_area > 0 and original_area > 0 and mask.sum() > 0:
            if mask_area / original_area < ovl_thr:
                continue
            if not isthing:
                if pred_class in stuff_memory:
                    panoptic[mask] = stuff_memory[pred_class]
                    continue
                else:
                    stuff_memory[pred_class] = current + 1
            current += 1
            panoptic[mask] = current
            segments.append((current, bool(isthing), pred_class))
    return panoptic, segments


def _inputs(seed=0):
    """Random logits/masks biased to exercise keep/overlap/merge branches."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(B, Q, K + 1)).astype(np.float32) * 4.0
    # a few confident background queries (keep=False branch)
    logits[:, :3, K] += 8.0
    masks = rng.normal(size=(B, Q, H4, W4)).astype(np.float32) * 3.0
    # duplicate class labels across queries so stuff merging fires
    logits[:, 4, 1] += 10.0
    logits[:, 5, 1] += 10.0
    logits[:, 6, 2] += 10.0
    logits[:, 7, 2] += 10.0
    return logits, masks


THING_IDS = {0, 2, 4}  # classes 1, 3, 5 are stuff
THING_MASK = np.array([k in THING_IDS for k in range(K)])


def test_semantic_matches_reference_math():
    logits, masks = _inputs()
    got = np.asarray(semantic_inference(jnp.asarray(logits),
                                        jnp.asarray(masks)))
    for b in range(B):
        np.testing.assert_allclose(got[b], _ref_semantic(logits[b], masks[b]),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_panoptic_matches_reference_loop(seed):
    logits, masks = _inputs(seed)
    out = panoptic_inference(jnp.asarray(logits), jnp.asarray(masks),
                             jnp.asarray(THING_MASK))
    assert isinstance(out, PanopticSeg)
    for b in range(B):
        ref_seg, ref_segments = _ref_panoptic(logits[b], masks[b], THING_IDS)
        np.testing.assert_array_equal(np.asarray(out.seg[b]), ref_seg)
        got_segments = [
            (int(out.ids[b, q]), bool(out.isthing[b, q]),
             int(out.classes[b, q]))
            for q in range(Q) if bool(out.valid[b, q])]
        assert got_segments == ref_segments


def test_panoptic_empty_image():
    """No query above the object threshold -> all-void output."""
    logits = np.zeros((1, Q, K + 1), np.float32)
    logits[..., K] = 10.0  # everything background
    masks = np.random.default_rng(0).normal(size=(1, Q, H4, W4)) \
        .astype(np.float32)
    out = panoptic_inference(jnp.asarray(logits), jnp.asarray(masks),
                             jnp.asarray(THING_MASK))
    assert not bool(out.valid.any())
    assert int(np.asarray(out.seg).max()) == 0


def test_panoptic_jits():
    logits, masks = _inputs()
    fn = jax.jit(lambda l, m: panoptic_inference(l, m,
                                                 jnp.asarray(THING_MASK)))
    out = fn(jnp.asarray(logits), jnp.asarray(masks))
    ref_seg, _ = _ref_panoptic(logits[0], masks[0], THING_IDS)
    np.testing.assert_array_equal(np.asarray(out.seg[0]), ref_seg)


def test_tta_flip_consistency():
    """With a pointwise (flip-equivariant) model, the flipped variants'
    un-flipped contributions equal the unflipped ones, so TTA with and
    without flip must agree — this pins the un-flip axis/order logic."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 32, 64, 3)).astype(np.float32))
    wq = jnp.asarray(rng.normal(size=(Q,)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(1, Q, K + 1)).astype(np.float32))

    def apply_fn(x):
        from mal_tpu.ops.interp import resize_bilinear
        h, w = x.shape[1] // 4, x.shape[2] // 4
        base = resize_bilinear(x, h, w).mean(-1)  # (1, h, w)
        return logits, base[:, None] * wq[None, :, None, None]

    with_flip = semantic_tta(apply_fn, img, scales=(1.0, 0.5), flip=True)
    without = semantic_tta(apply_fn, img, scales=(1.0, 0.5), flip=False)
    np.testing.assert_allclose(np.asarray(with_flip), np.asarray(without),
                               rtol=1e-4, atol=1e-5)
    assert with_flip.shape == (1, K, 32, 64)


def test_tta_real_model_single_scale_equals_direct():
    """scales=(1.0,), flip=False reduces to plain semantic inference."""
    from mal_tpu.segment.mask2former import Mask2Former

    model = Mask2Former(num_classes=K, swin_size="tiny", num_queries=Q)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3)))

    def apply_fn(x):
        return model.apply(variables, x)

    tta = semantic_tta(apply_fn, img, scales=(1.0,), flip=False)
    logits, masks = apply_fn(img)
    from mal_tpu.ops.interp import resize_bilinear
    direct = semantic_inference(logits, masks)
    direct = jnp.moveaxis(
        resize_bilinear(jnp.moveaxis(direct, 1, -1), 64, 96), -1, 1)
    np.testing.assert_allclose(np.asarray(tta), np.asarray(direct),
                               rtol=1e-5, atol=1e-6)
