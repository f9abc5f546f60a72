"""Segmenter fine-tuning data path: RLE decode, target padding, jit step."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mal_tpu.segment.criterion import CriterionConfig
from mal_tpu.segment.finetune import (category_index, coco_to_targets,
                                      collate_targets, make_seg_finetune_step,
                                      rle_decode)
from mal_tpu.segment.mask2former import Mask2Former


def test_rle_decode_column_major():
    # 3x4: runs over the FLATTENED COLUMN-major array; first run background
    # column-major flat = [c0r0 c0r1 c0r2, c1r0, ...]
    counts = [2, 3, 7]          # 2 bg, 3 fg (end of col0 + col1 rows 0-1)
    m = rle_decode(counts, (3, 4))
    exp = np.zeros((3, 4), np.uint8)
    exp[2, 0] = 1               # col 0, row 2
    exp[0, 1] = 1               # col 1, row 0
    exp[1, 1] = 1               # col 1, row 1
    np.testing.assert_array_equal(m, exp)
    # zero-length leading run = mask starts with foreground
    m2 = rle_decode([0, 3, 9], (3, 4))
    assert m2[:, 0].all() and not m2[:, 1:].any()


def test_coco_to_targets_padding_and_mapping():
    h, w = 6, 8
    blob = np.zeros((h, w), np.float32)
    blob[2:4, 3:6] = 1.0
    cat_idx = category_index([7, 92, 3])     # sparse ids -> {3:0, 7:1, 92:2}
    anns = [{"category_id": 92, "segmentation": blob},
            {"category_id": 3, "segmentation": np.ones((h, w), np.float32)}]
    labels, masks, valid = coco_to_targets(anns, h, w, max_instances=4,
                                           cat_index=cat_idx)
    assert labels.tolist() == [2, 0, 0, 0]
    assert valid.tolist() == [True, True, False, False]
    np.testing.assert_array_equal(masks[0], blob)
    assert masks[2].sum() == 0

    # truncation keeps list order
    many = [{"category_id": 3, "segmentation": blob}] * 6
    _, _, v = coco_to_targets(many, h, w, max_instances=4, cat_index=cat_idx)
    assert v.sum() == 4


@pytest.mark.slow
def test_finetune_step_runs_and_improves():
    model = Mask2Former(num_classes=5, swin_size="tiny", num_queries=8)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    blob = np.zeros((64, 96), np.float32)
    blob[:32] = 1.0
    anns = [{"category_id": 11, "segmentation": blob},
            {"category_id": 4, "segmentation": 1.0 - blob}]
    tgt = coco_to_targets(anns, 64, 96, max_instances=4,
                          cat_index=category_index([4, 11]))
    labels, masks, valid = collate_targets([tgt])

    tx = optax.adam(1e-5)
    cfg = CriterionConfig(num_classes=5, num_points=64)
    step = jax.jit(make_seg_finetune_step(model, tx, cfg))
    opt_state = tx.init(vars_)
    v, opt_state, m1 = step(vars_, opt_state, images, labels, masks, valid,
                            jax.random.PRNGKey(1))
    v, opt_state, m2 = step(v, opt_state, images, labels, masks, valid,
                            jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
