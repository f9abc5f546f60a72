"""Mask2Former front-end tests (tiny Swin for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mal_tpu.segment.instances import Instances
from mal_tpu.segment.mask2former import Mask2Former, instance_inference
from mal_tpu.segment.msdeform import ms_deform_attn_core
from mal_tpu.segment.swin import (SwinTransformer, window_partition,
                                  window_reverse)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 8, 12, 5)).astype(np.float32))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 2 * 3, 4, 4, 5)
    back = window_reverse(wins, 4, 8, 12)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_swin_tiny_shapes():
    model = SwinTransformer("tiny")
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x)
    assert outs["res2"].shape == (1, 16, 24, 96)
    assert outs["res3"].shape == (1, 8, 12, 192)
    assert outs["res4"].shape == (1, 4, 6, 384)
    assert outs["res5"].shape == (1, 2, 3, 768)


def test_swin_bf16_compute_close_to_fp32():
    """bf16_compute: same params, same structure, outputs within bf16
    rounding of the fp32 path (the fast-mode knob for the temporal hint's
    Swin forward)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    f32 = SwinTransformer("tiny")
    bf16 = SwinTransformer("tiny", bf16_compute=True)
    vars_ = f32.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (the knob changes compute dtype only)
    assert (jax.tree_util.tree_structure(vars_)
            == jax.tree_util.tree_structure(bf16.init(jax.random.PRNGKey(0),
                                                      x)))
    o32 = f32.apply(vars_, x)
    o16 = bf16.apply(vars_, x)
    for k in o32:
        a, b = np.asarray(o32[k]), np.asarray(o16[k])
        assert b.dtype == np.float32  # residual stream stays fp32
        scale = np.abs(a).max()
        assert np.abs(a - b).max() / scale < 0.05, k


def test_swin_drop_path():
    """Stochastic depth (`mask2former/config.py:86`, swin.py:292-293):
    identity at eval, per-key random at train, deterministic per key."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 64, 96, 3)), jnp.float32)
    plain = SwinTransformer("tiny")
    dp = SwinTransformer("tiny", drop_path_rate=0.5)
    vars_ = plain.init(jax.random.PRNGKey(0), x)

    # eval: drop-path is identity -> same outputs as the rate-0 model
    o_plain = plain.apply(vars_, x)
    o_eval = dp.apply(vars_, x)
    for k in o_plain:
        np.testing.assert_array_equal(np.asarray(o_plain[k]),
                                      np.asarray(o_eval[k]))

    # train: rng-dependent, deterministic per key, different across keys
    t1 = dp.apply(vars_, x, train=True,
                  rngs={"droppath": jax.random.PRNGKey(1)})
    t1b = dp.apply(vars_, x, train=True,
                   rngs={"droppath": jax.random.PRNGKey(1)})
    t2 = dp.apply(vars_, x, train=True,
                  rngs={"droppath": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(t1["res5"]),
                                  np.asarray(t1b["res5"]))
    assert np.abs(np.asarray(t1["res5"]) - np.asarray(t2["res5"])).max() > 0
    assert np.isfinite(np.asarray(t1["res5"])).all()


def test_ms_deform_attn_core_matches_torch_reference():
    """Parity with the reference's pure-torch fallback
    (`ops/functions/ms_deform_attn_func.py:52-72`) implemented as oracle."""
    rng = np.random.RandomState(1)
    B, heads, C = 2, 2, 4
    shapes = [(6, 8), (3, 4)]
    total = sum(h * w for h, w in shapes)
    Lq, P = 5, 3
    L = len(shapes)

    value = rng.uniform(-1, 1, (B, total, heads, C)).astype(np.float32)
    locs = rng.uniform(0.1, 0.9, (B, Lq, heads, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, Lq, heads, L, P)).astype(np.float32)
    attn = attn / attn.sum((-1, -2), keepdims=True)

    ours = np.asarray(ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(attn)))

    # torch oracle
    tv = torch.from_numpy(value)
    sampling_grids = 2 * torch.from_numpy(locs) - 1
    value_list = tv.split([h * w for h, w in shapes], dim=1)
    out = 0
    for lid, (h, w) in enumerate(shapes):
        v_l = value_list[lid].flatten(2).transpose(1, 2).reshape(B * heads, C, h, w)
        g_l = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*heads, Lq, P, 2)
        sampled = F.grid_sample(v_l, g_l, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        out = out + (sampled.view(B, heads, C, Lq, P)
                     * torch.from_numpy(attn)[:, :, :, lid].permute(0, 2, 1, 3)[:, :, None])
    ref = out.sum(-1).permute(0, 3, 1, 2).reshape(B, Lq, heads * C).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_instance_inference_topk_and_scores():
    B, Q, K, h, w = 1, 6, 3, 8, 8
    rng = np.random.RandomState(2)
    logits = np.full((B, Q, K + 1), -5.0, np.float32)
    # query 2 -> class 1 strong; query 4 -> class 0 medium
    logits[0, 2, 1] = 5.0
    logits[0, 4, 0] = 3.0
    masks = rng.uniform(-3, -1, (B, Q, h, w)).astype(np.float32)
    masks[0, 2, :4] = 2.0   # top half
    masks[0, 4, :, :4] = 1.5

    inst = instance_inference(jnp.asarray(logits), jnp.asarray(masks),
                              16, 16, max_instances=4)
    assert inst.masks.shape == (1, 4, 16, 16)
    cls = np.asarray(inst.classes[0])
    sc = np.asarray(inst.scores[0])
    assert cls[0] == 1 and cls[1] == 0  # ranked by score
    assert sc[0] > sc[1] > sc[2]
    # binarized upsampled mask covers the right region
    m0 = np.asarray(inst.masks[0, 0])
    assert m0[:8].mean() > 0.9 and m0[8:].mean() < 0.1


@pytest.mark.slow
def test_mask2former_tiny_end_to_end():
    model = Mask2Former(num_classes=5, swin_size="tiny", num_queries=8)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    logits, masks = model.apply(vars_, x)
    assert logits.shape == (1, 8, 6)
    assert masks.shape == (1, 8, 16, 24)
    assert bool(jnp.isfinite(logits).all() and jnp.isfinite(masks).all())


def test_segmenter_preprocessing_matches_reference_tensor_math():
    """mal_tpu preprocessing == the reference's BGR feed + detectron2
    normalize (`manydepth/dyn_utils.py:172-188` -> `maskformer_model.py:
    193-195`), computed here with the reference's own torch ops."""
    from mal_tpu.segment.mask2former import preprocess_images

    rng = np.random.RandomState(4)
    rgb = rng.uniform(0, 1, (2, 3, 16, 24)).astype(np.float32)  # (B,3,H,W)

    # reference math (dyn_utils.generate_instances + MaskFormer normalizer)
    images = torch.from_numpy(rgb)
    permute = [2, 1, 0]
    images = images[:, permute, :, :]
    images = images * 255
    pixel_mean = torch.tensor([123.675, 116.28, 103.53]).view(-1, 1, 1)
    pixel_std = torch.tensor([58.395, 57.12, 57.375]).view(-1, 1, 1)
    ref = ((images - pixel_mean) / pixel_std).permute(0, 2, 3, 1).numpy()

    ours = np.asarray(preprocess_images(
        jnp.asarray(np.transpose(rgb, (0, 2, 3, 1)))))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-5)

    # color-correct variant differs (sanity that the flag does something)
    no_flip = np.asarray(preprocess_images(
        jnp.asarray(np.transpose(rgb, (0, 2, 3, 1))), bgr_input=False))
    assert np.abs(no_flip - ref).max() > 0.1


def test_msdeform_pallas_sampler_matches_per_level():
    """The gather-free one-hot-matmul sampler (interpret mode) == the
    per-level grid_sample path, incl. out-of-range zeros-padding corners."""
    from mal_tpu.segment.msdeform import (ms_deform_attn_core_pallas,
                                          ms_deform_attn_core_per_level)

    rng = np.random.RandomState(11)
    B, H_, C, L, P, Lq = 2, 4, 8, 3, 4, 37
    shapes = [(6, 10), (3, 5), (2, 3)]
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, S, H_, C).astype(np.float32))
    # include out-of-range locations to exercise zeros-padding corners
    locs = jnp.asarray(rng.uniform(-0.2, 1.2,
                                   (B, Lq, H_, L, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H_, L * P).astype(np.float32))).reshape(
        B, Lq, H_, L, P)

    ref = ms_deform_attn_core_per_level(value, shapes, locs, attn)
    got = ms_deform_attn_core_pallas(value, shapes, locs, attn,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # bf16 fast-training variant: single-pass bf16 matmuls, fp32 accum —
    # loose tolerance (the values here are O(1) randn)
    got_b = ms_deform_attn_core_pallas(value, shapes, locs, attn,
                                       interpret=True,
                                       mxu_precision="bf16")
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref),
                               rtol=0, atol=5e-2)


def test_msdeform_pallas_multi_tile_queries():
    """Lq > QUERY_TILE exercises the v4 kernel's (g, tq, p) index maps and
    the cross-tile output accumulation windows (Tq=2), plus the padded
    tail queries (aw=0 -> zero contribution)."""
    from mal_tpu.ops.pallas.deform_sample import QUERY_TILE
    from mal_tpu.segment.msdeform import (ms_deform_attn_core_pallas,
                                          ms_deform_attn_core_per_level)

    rng = np.random.RandomState(5)
    B, H_, C, L, P = 1, 2, 8, 3, 2
    Lq = QUERY_TILE + 40                      # Tq = 2, 93% pad in tile 2
    shapes = [(4, 6), (2, 3), (1, 2)]
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, S, H_, C).astype(np.float32))
    locs = jnp.asarray(rng.uniform(-0.1, 1.1,
                                   (B, Lq, H_, L, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H_, L * P).astype(np.float32))).reshape(
        B, Lq, H_, L, P)

    ref = ms_deform_attn_core_per_level(value, shapes, locs, attn)
    got = ms_deform_attn_core_pallas(value, shapes, locs, attn,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
