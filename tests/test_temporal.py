"""Temporal hint (dynamic-object synthesis) + matcher tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from mal_tpu.segment.instances import Instances
from mal_tpu.segment.matcher import dice_cost, hungarian_match, match_instances
from mal_tpu.temporal import _bbox_bounds, _shift2d, image_synthesis


def test_hungarian_matches_scipy():
    """JV solve is exact at every size incl. beyond the old N<=8 cap."""
    rng = np.random.RandomState(0)
    for n in (2, 3, 5, 8, 16, 32):
        for _ in range(5):
            C = rng.uniform(0, 10, (n, n)).astype(np.float32)
            row_of_col = np.asarray(hungarian_match(jnp.asarray(C)))
            cols = np.arange(n)
            assert sorted(row_of_col.tolist()) == list(range(n))
            ours = C[row_of_col, cols].sum()
            ri, ci = linear_sum_assignment(C)
            np.testing.assert_allclose(ours, C[ri, ci].sum(), rtol=1e-6)


def test_hungarian_matches_bruteforce():
    from mal_tpu.segment.matcher import hungarian_match_bruteforce

    rng = np.random.RandomState(3)
    for n in (2, 4, 7):
        C = rng.uniform(0, 5, (n, n)).astype(np.float32)
        jv = np.asarray(hungarian_match(jnp.asarray(C)))
        bf = np.asarray(hungarian_match_bruteforce(jnp.asarray(C)))
        cols = np.arange(n)
        np.testing.assert_allclose(C[jv, cols].sum(), C[bf, cols].sum(),
                                   rtol=1e-6)


def test_hungarian_with_big_invalid_costs():
    """Padded-slot costs (_BIG) must not destabilize the JV duals."""
    rng = np.random.RandomState(5)
    for n, valid in ((8, 3), (16, 5)):
        C = np.full((n, n), 1e6, np.float32)
        C[:valid, :valid] = rng.uniform(0, 2, (valid, valid))
        row_of_col = np.asarray(hungarian_match(jnp.asarray(C)))
        ri, ci = linear_sum_assignment(C)
        np.testing.assert_allclose(
            C[row_of_col, np.arange(n)].sum(), C[ri, ci].sum(), rtol=1e-6)


def test_dice_cost_identical_masks():
    m = np.zeros((2, 64), np.float32)
    m[0, :10] = 1
    m[1, 20:40] = 1
    c = np.asarray(dice_cost(jnp.asarray(m), jnp.asarray(m)))
    np.testing.assert_allclose(np.diag(c), 0.0, atol=1e-5)
    assert c[0, 1] > 0.9  # disjoint masks ~ 1


def _square_mask(H, W, y0, y1, x0, x1):
    m = np.zeros((H, W), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_bbox_bounds():
    H, W = 16, 24
    m = _square_mask(H, W, 3, 7, 5, 11)  # rows 3..6, cols 5..10
    low, top, right, left = _bbox_bounds(jnp.asarray(m[None]))
    assert (int(low[0]), int(top[0]), int(right[0]), int(left[0])) == (6, 3, 10, 5)


def test_shift2d_matches_numpy_slicing():
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (8, 10)).astype(np.float32)
    for dy, dx in [(2, 3), (-2, 1), (0, -4), (-3, -3), (5, 0)]:
        out = np.asarray(_shift2d(jnp.asarray(x), jnp.asarray(dy), jnp.asarray(dx)))
        ref = np.zeros_like(x)
        H, W = x.shape
        ref[max(0, dy):H + min(0, dy), max(0, dx):W + min(0, dx)] = \
            x[max(0, -dy):H + min(0, -dy), max(0, -dx):W + min(0, -dx)]
        np.testing.assert_allclose(out, ref)


def _make_instances(masks_list, classes, scores):
    """Build a B=1 padded Instances from a list of (H, W) masks."""
    N = 4
    H, W = masks_list[0].shape if masks_list else (16, 24)
    masks = np.zeros((1, N, H, W), np.float32)
    cls = np.full((1, N), -1, np.int32)
    sc = np.zeros((1, N), np.float32)
    valid = np.zeros((1, N), bool)
    for i, (m, c, s) in enumerate(zip(masks_list, classes, scores)):
        masks[0, i] = m
        cls[0, i] = c
        sc[0, i] = s
        valid[0, i] = True
    return Instances(jnp.asarray(masks), jnp.asarray(cls), jnp.asarray(sc),
                     jnp.asarray(valid))


def test_match_instances_by_class_and_overlap():
    H, W = 16, 24
    car_cur = _square_mask(H, W, 4, 8, 8, 12)
    car_last = _square_mask(H, W, 4, 8, 6, 10)
    car_next = _square_mask(H, W, 4, 8, 10, 14)
    person_cur = _square_mask(H, W, 10, 14, 2, 5)
    person_last = _square_mask(H, W, 10, 14, 2, 5)
    person_next = _square_mask(H, W, 10, 14, 3, 6)

    cur = _make_instances([car_cur, person_cur], [2, 0], [0.9, 0.9])
    # order swapped in last frame: person first
    last = _make_instances([person_last, car_last], [0, 2], [0.8, 0.8])
    nxt = _make_instances([car_next, person_next], [2, 0], [0.8, 0.8])

    li, ni, pv = match_instances(last, nxt, cur)
    li, ni, pv = np.asarray(li), np.asarray(ni), np.asarray(pv)
    assert pv[0, 0] and pv[0, 1]
    assert li[0, 0] == 1 and ni[0, 0] == 0   # car: last slot 1, next slot 0
    assert li[0, 1] == 0 and ni[0, 1] == 1   # person
    assert not pv[0, 2] and not pv[0, 3]     # padding slots invalid


def test_image_synthesis_moves_object_to_midpoint():
    H, W = 16, 32
    # object rows 4..8; last at cols 4..12, next at cols 8..16 (delta=+4).
    # Note the synthesis only rewrites pixels inside the union of the two
    # masks (`dyn_utils.py:113`), so the motion must overlap for the midpoint
    # to be visible — true for the reference too.
    m_last = _square_mask(H, W, 4, 8, 4, 12)
    m_next = _square_mask(H, W, 4, 8, 8, 16)

    img_last = np.zeros((H, W, 3), np.float32)
    img_last[m_last] = 1.0
    img_next = np.zeros((H, W, 3), np.float32)
    img_next[m_next] = 1.0

    cur = _make_instances([_square_mask(H, W, 4, 8, 6, 14)], [2], [0.9])
    last_i = _make_instances([m_last], [2], [0.8])
    next_i = _make_instances([m_next], [2], [0.8])

    syn_l, syn_n, has = image_synthesis(
        jnp.asarray(img_last[None]), jnp.asarray(img_next[None]),
        cur, last_i, next_i)
    assert bool(has[0])
    syn_l = np.asarray(syn_l[0])
    syn_n = np.asarray(syn_n[0])

    # last object moved +2 cols (half of +4): now spans cols 6..14
    assert syn_l[5, 10, 0] == 1.0   # inside moved object
    assert syn_l[5, 13, 0] == 1.0
    assert syn_l[5, 5, 0] == 0.0    # vacated, bg-infilled from next (black)
    # next object moved -2 cols: also spans cols 6..14
    assert syn_n[5, 10, 0] == 1.0
    assert syn_n[5, 15, 0] == 0.0   # vacated on the right


def test_image_synthesis_no_instances_is_identity():
    H, W = 16, 24
    rng = np.random.RandomState(0)
    img_l = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    img_n = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    empty = Instances.empty(1, 4, H, W)
    syn_l, syn_n, has = image_synthesis(jnp.asarray(img_l), jnp.asarray(img_n),
                                        empty, empty, empty)
    assert not bool(has[0])
    np.testing.assert_allclose(np.asarray(syn_l), img_l)
    np.testing.assert_allclose(np.asarray(syn_n), img_n)


def test_max_instances_no_truncation():
    """The default `max_instances` must carry a busy frame without silently
    truncating the temporal hint. The reference keeps up to 100
    score-filtered queries (`manydepth/dyn_utils.py:140`,
    `maskformer_model.py:361-380`); the old cap of 8 dropped confident
    objects past the 8th. With 12 confident objects, the default-cap run
    must recover exactly the same confident instance set as a high-cap run
    (and the old cap of 8 demonstrably truncates)."""
    from mal_tpu.config import Config
    from mal_tpu.segment.mask2former import instance_inference

    B, Q, K, n_obj = 1, 50, 19, 12
    logits = np.full((B, Q, K + 1), -8.0, np.float32)
    logits[..., K] = 8.0  # every query confidently background...
    masks = np.full((B, Q, 24, 32), -8.0, np.float32)
    for i in range(n_obj):  # ...except the first 12, one class each
        logits[0, i, K] = -8.0
        logits[0, i, i % K] = 8.0
        r, c = (3 * i) % 20, (5 * i) % 28
        masks[0, i, r:r + 4, c:c + 4] = 8.0

    def confident(cap):
        inst = instance_inference(jnp.asarray(logits), jnp.asarray(masks),
                                  48, 64, max_instances=cap)
        keep = np.asarray(inst.scores[0]) > 0.5
        return (set(np.asarray(inst.classes[0])[keep].tolist()),
                int(keep.sum()))

    default_cap = Config().max_instances
    assert default_cap >= n_obj, (
        f"default max_instances={default_cap} cannot carry a {n_obj}-object "
        "frame")
    cls_default, n_default = confident(default_cap)
    cls_high, n_high = confident(32)
    assert n_default == n_high == n_obj
    assert cls_default == cls_high
    _, n_old = confident(8)
    assert n_old < n_obj  # the old default really did truncate this frame


def test_image_synthesis_bf16_payload_close():
    """Fast-mode bf16 synthesis payload (round 5): outputs stay the input
    dtype and match the fp32 path within bf16 tolerance; gradients flow."""
    H, W = 16, 32
    rng = np.random.RandomState(1)
    m_last = _square_mask(H, W, 4, 8, 4, 12)
    m_next = _square_mask(H, W, 4, 8, 8, 16)
    img_last = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    img_next = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)

    cur = _make_instances([_square_mask(H, W, 4, 8, 6, 14)], [2], [0.9])
    last_i = _make_instances([m_last], [2], [0.8])
    next_i = _make_instances([m_next], [2], [0.8])

    args = (jnp.asarray(img_last[None]), jnp.asarray(img_next[None]),
            cur, last_i, next_i)
    syn32 = image_synthesis(*args)
    syn16 = image_synthesis(*args, payload_dtype=jnp.bfloat16)
    assert syn16[0].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(syn16[0]), np.asarray(syn32[0]),
                               atol=8e-3)
    np.testing.assert_allclose(np.asarray(syn16[1]), np.asarray(syn32[1]),
                               atol=8e-3)

    g = jax.grad(lambda a: jnp.sum(image_synthesis(
        a, args[1], cur, last_i, next_i,
        payload_dtype=jnp.bfloat16)[0]))(args[0])
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0
