"""COCO-style mask-AP evaluator — hand-computed oracle cases.

pycocotools is not in this environment; every expected value below is
derived by hand from the COCO protocol (greedy score-ordered matching,
101-point interpolated AP) and annotated with the arithmetic.
"""

from __future__ import annotations

import numpy as np

from mal_tpu.segment.evaluation import (evaluate_instances, mask_iou,
                                        _average_precision)


def _box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def test_mask_iou():
    a = _box_mask(8, 8, 0, 4, 0, 8)          # top half
    b = _box_mask(8, 8, 2, 6, 0, 8)          # middle half: inter 16, union 48
    iou = mask_iou(np.stack([a]), np.stack([a, b]))
    np.testing.assert_allclose(iou, [[1.0, 16 / 48]])


def test_perfect_predictions_ap_100():
    gt = [{"masks": np.stack([_box_mask(8, 8, 0, 4, 0, 4),
                              _box_mask(8, 8, 4, 8, 4, 8)]),
           "classes": np.asarray([0, 1])}]
    pred = [{"masks": gt[0]["masks"].copy(),
             "scores": np.asarray([0.9, 0.8]),
             "classes": np.asarray([0, 1])}]
    res = evaluate_instances(pred, gt)
    np.testing.assert_allclose(res["AP"], 100.0)
    np.testing.assert_allclose(res["AP50"], 100.0)
    np.testing.assert_allclose(res["AP75"], 100.0)


def test_half_recall():
    """2 GT, 1 perfect detection, no FP: p(r)=1 for r<=0.5 else 0 ->
    AP = 51/101 of the 101 recall points."""
    gt = [{"masks": np.stack([_box_mask(8, 8, 0, 4, 0, 4),
                              _box_mask(8, 8, 4, 8, 4, 8)]),
           "classes": np.asarray([0, 0])}]
    pred = [{"masks": gt[0]["masks"][:1],
             "scores": np.asarray([0.9]),
             "classes": np.asarray([0])}]
    res = evaluate_instances(pred, gt)
    np.testing.assert_allclose(res["AP50"], 100.0 * 51 / 101)
    np.testing.assert_allclose(res["AP"], 100.0 * 51 / 101)


def test_iou_threshold_gates_match():
    """Detection overlapping GT at IoU = 0.6: TP at thresholds 0.50/0.55/
    0.60, FP above -> AP50 = 100, AP75 = 0, AP = (3/10)*100*(51/51...)"""
    gt = [{"masks": np.stack([_box_mask(10, 10, 0, 10, 0, 5)]),
           "classes": np.asarray([2])}]
    # pred covers cols 1..6 of rows 0..10: inter 40, union 60+50-40=70?
    # use exact IoU 0.6: gt cols 0:5 (50 px), pred cols 0:8 (80 px),
    # inter 50 -> 50/80 = 0.625 ... construct iou=0.6: pred cols 0:10
    # rows 0:6 (60 px), gt 50 px, inter rows 0:6 cols 0:5 = 30 ->
    # 30/(60+50-30)=0.375. Simplest: pred = gt plus extra area so
    # iou = 50/(50+extra); extra = 33 -> 50/83 = 0.602.
    pm = gt[0]["masks"][0].copy()
    extra = np.zeros_like(pm)
    extra[0:10, 5:8] = 1.0       # 30 px
    extra[0, 8] = 1.0
    extra[1, 8] = 1.0
    extra[2, 8] = 1.0            # 33 extra px -> IoU 50/83 = 0.6024
    pred = [{"masks": np.stack([pm + extra]),
             "scores": np.asarray([0.9]),
             "classes": np.asarray([2])}]
    res = evaluate_instances(pred, gt)
    np.testing.assert_allclose(res["AP50"], 100.0)
    np.testing.assert_allclose(res["AP75"], 0.0)
    # thresholds 0.50, 0.55, 0.60 pass (0.6024 >= t); 7 of 10 fail
    np.testing.assert_allclose(res["AP"], 100.0 * 3 / 10)


def test_high_scoring_false_positive_halves_precision():
    """[FP at s=0.9, TP at s=0.8], 1 GT: envelope precision 0.5 at every
    recall -> AP50 = 50."""
    gtm = _box_mask(8, 8, 0, 4, 0, 8)
    fp = _box_mask(8, 8, 6, 8, 0, 2)     # no overlap
    gt = [{"masks": np.stack([gtm]), "classes": np.asarray([0])}]
    pred = [{"masks": np.stack([fp, gtm]),
             "scores": np.asarray([0.9, 0.8]),
             "classes": np.asarray([0, 0])}]
    res = evaluate_instances(pred, gt)
    np.testing.assert_allclose(res["AP50"], 50.0)


def test_greedy_match_prefers_higher_score_then_higher_iou():
    """Two detections compete for one GT: the higher-scored one claims it,
    the other becomes FP even with higher IoU."""
    gtm = _box_mask(8, 8, 0, 4, 0, 8)
    near = gtm.copy()
    near[4] = 1.0                        # IoU 32/40 = 0.8
    gt = [{"masks": np.stack([gtm]), "classes": np.asarray([0])}]
    pred = [{"masks": np.stack([near, gtm]),   # near scored HIGHER
             "scores": np.asarray([0.95, 0.9]),
             "classes": np.asarray([0, 0])}]
    res = evaluate_instances(pred, gt)
    # at t=0.5: near (s=.95) claims the gt (TP), exact copy becomes FP:
    # dets in score order = [TP, FP] -> precision 1.0 at recall 1.0
    np.testing.assert_allclose(res["AP50"], 100.0)
    # at t=0.85: near fails IoU, exact copy matches -> order [FP, TP]
    # -> envelope precision 0.5 everywhere
    r85 = evaluate_instances(pred, gt, iou_thresholds=(0.85,))
    np.testing.assert_allclose(r85["AP"], 50.0)


def test_classes_are_separate():
    """A detection of the wrong class never matches."""
    gtm = _box_mask(8, 8, 0, 4, 0, 8)
    gt = [{"masks": np.stack([gtm]), "classes": np.asarray([1])}]
    pred = [{"masks": np.stack([gtm]), "scores": np.asarray([0.9]),
             "classes": np.asarray([0])}]
    res = evaluate_instances(pred, gt)
    np.testing.assert_allclose(res["AP"], 0.0)


def test_multi_image_accumulation():
    """PR curve pools detections across images by score: img1 has a TP at
    s=0.9, img2 an FP at s=0.95 and a TP at s=0.5, 2 GT total ->
    dets sorted: [FP .95, TP .9, TP .5]; precisions 0, 1/2, 2/3;
    envelope -> 2/3 for r<=0.5, 2/3 for r<=1.0 -> AP50 = 66.67."""
    g1 = _box_mask(8, 8, 0, 4, 0, 8)
    g2 = _box_mask(8, 8, 4, 8, 0, 8)
    fp = _box_mask(8, 8, 0, 2, 0, 2)
    gt = [{"masks": np.stack([g1]), "classes": np.asarray([0])},
          {"masks": np.stack([g2]), "classes": np.asarray([0])}]
    pred = [{"masks": np.stack([g1]), "scores": np.asarray([0.9]),
             "classes": np.asarray([0])},
            {"masks": np.stack([fp, g2]),
             "scores": np.asarray([0.95, 0.5]),
             "classes": np.asarray([0, 0])}]
    res = evaluate_instances(pred, gt, iou_thresholds=(0.5,))
    np.testing.assert_allclose(res["AP50"], 100.0 * 2 / 3, rtol=1e-6)


def test_average_precision_empty_and_nan():
    assert _average_precision(np.zeros(0, bool), np.zeros(0), 3) == 0.0
    assert np.isnan(_average_precision(np.zeros(0, bool), np.zeros(0), 0))
