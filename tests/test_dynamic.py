"""DynamicDepth ops: forward splat warp + occlusion-aware cost volume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.dynamic.cost_volume import occlusion_aware_cost_volume
from mal_tpu.dynamic.warp import forward_warp, inverse_warp
from mal_tpu.ops.cost_volume import compute_depth_bins, plane_sweep_cost_volume
from mal_tpu.ops.warp import forward_splat_depth, zbuffer_scatter_max


def _camera(B, H, W):
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    return np.broadcast_to(K, (B, 3, 3)).copy()


def test_forward_warp_identity_pose_roundtrip():
    rng = np.random.RandomState(0)
    B, H, W = 1, 24, 32
    img = rng.uniform(0.2, 1, (B, H, W, 3)).astype(np.float32)
    depth = np.full((B, H, W), 5.0, np.float32)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    K = _camera(B, H, W)

    img_w, depth_w, valid = forward_warp(
        jnp.asarray(img), jnp.asarray(depth), jnp.asarray(T), jnp.asarray(K))
    img_w, depth_w, valid = map(np.asarray, (img_w, depth_w, valid))
    # interior must round-trip exactly (flat depth, identity pose)
    inner = np.s_[0, 4:-4, 4:-4]
    assert valid[inner].all()
    np.testing.assert_allclose(depth_w[inner], 5.0, rtol=1e-5)
    np.testing.assert_allclose(img_w[0, 4:-4, 4:-4], img[0, 4:-4, 4:-4], atol=1e-4)


def test_forward_warp_translation_shifts_object():
    B, H, W = 1, 32, 48
    K = _camera(B, H, W)
    depth = np.full((B, H, W), 10.0, np.float32)
    img = np.zeros((B, H, W, 3), np.float32)
    img[0, 12:20, 20:28] = 1.0

    # camera translates right by t -> pixels shift left by fx * t / z
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T[0, 0, 3] = -2.0  # point cloud moves -x
    shift = K[0, 0, 0] * 2.0 / 10.0  # ~5.57 px

    img_w, _, valid = forward_warp(jnp.asarray(img), jnp.asarray(depth),
                                   jnp.asarray(T), jnp.asarray(K))
    img_w = np.asarray(img_w)
    ys, xs = np.where(img_w[0, :, :, 0] > 0.5)
    assert len(xs) > 0
    # original box center col 23.5, expect ~23.5 - 5.57
    assert abs(xs.mean() - (23.5 - shift)) < 1.5
    assert abs(ys.mean() - 15.5) < 1.0


def test_zbuffer_keeps_nearest():
    # two points land on the same pixel: nearest (max inverse depth) wins
    pix = jnp.asarray([[[5.0, 5.0], [5.2, 5.1]]])  # both round to (5,5)
    vals = jnp.asarray([[0.1, 0.5]])  # inverse depths
    out = zbuffer_scatter_max(pix, vals, jnp.asarray([[True, True]]), 8, 8)
    assert float(out[0, 5, 5]) == 0.5


def _cv_inputs(B=2, F=1, h=12, w=20, C=8, seed=0):
    rng = np.random.RandomState(seed)
    cur = rng.uniform(0, 1, (B, h, w, C)).astype(np.float32)
    lookup = rng.uniform(0, 1, (B, F, h, w, C)).astype(np.float32)
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0], K4[1, 1] = 0.58 * w, 1.92 * h
    K4[0, 2], K4[1, 2] = 0.5 * w, 0.5 * h
    K4 = np.broadcast_to(K4, (B, 4, 4)).copy()
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (B, F, 4, 4)).copy()
    poses[:, :, 0, 3] = 0.2
    imgs = rng.uniform(0.2, 1, (B, F, 4 * h, 4 * w, 3)).astype(np.float32)
    return cur, lookup, poses, K4, np.linalg.inv(K4), imgs


def test_occlusion_cv_defaults_match_plain_cv():
    cur, lookup, poses, K, invK, imgs = _cv_inputs()
    bins = compute_depth_bins(0.5, 10.0, 8, "linear")
    aug = jnp.zeros((2,))
    c1, m1 = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs), aug,
        chunk=4)
    c2, m2 = plane_sweep_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, chunk=4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2))


def test_occlusion_cv_set1_raises_cost_in_occluded_region():
    cur, lookup, poses, K, invK, imgs = _cv_inputs()
    # blacken a region of the lookup image -> occluded
    imgs[:, :, :, :40] = 0.0
    bins = compute_depth_bins(0.5, 10.0, 8, "linear")
    aug = jnp.zeros((2,))
    c_plain, _ = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs), aug,
        set_1=False, chunk=4)
    c_set1, _ = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs), aug,
        set_1=True, pool_th=0.15, chunk=4)
    # occluded-region cost must increase (features forced to 1.0)
    inner = np.asarray(c_set1)[:, :, 3:-3, 3:6].mean()
    inner_plain = np.asarray(c_plain)[:, :, 3:-3, 3:6].mean()
    assert inner > inner_plain

    # augmented items are exempt (`resnet_encoder.py:192`)
    c_aug, _ = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs),
        jnp.ones((2,)), set_1=True, pool_th=0.15, chunk=4)
    np.testing.assert_allclose(np.asarray(c_aug), np.asarray(c_plain), atol=1e-6)


def test_occlusion_cv_cv_min_takes_per_frame_min():
    cur, lookup, poses, K, invK, imgs = _cv_inputs(F=2, seed=3)
    poses[:, 1, 0, 3] = -0.15
    bins = compute_depth_bins(0.5, 10.0, 8, "linear")
    aug = jnp.zeros((2,))
    c_min, _ = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs), aug,
        cv_min=True, chunk=4)
    c_mean, _ = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs), aug,
        cv_min=False, chunk=4)
    # min <= mean wherever both observed both frames
    cm, ca = np.asarray(c_min), np.asarray(c_mean)
    interior = np.s_[:, :, 4:-4, 4:-4]
    assert (cm[interior] <= ca[interior] + 1e-5).all()


def test_occlusion_cv_pool_mode_runs():
    cur, lookup, poses, K, invK, imgs = _cv_inputs()
    imgs[:, :, :, :30] = 0.0
    bins = compute_depth_bins(0.5, 10.0, 8, "linear")
    c, m = occlusion_aware_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, jnp.asarray(imgs),
        jnp.zeros((2,)), pool=True, pool_r=2, pool_th=0.15, chunk=4)
    assert np.isfinite(np.asarray(c)).all()


def test_splat_depth_shared_inv_map_matches_direct():
    """forward_warp(inv_map=splat_depth(...)) == forward_warp(...) — the
    DOMD block shares one splat across same-pose warps (domd.py)."""
    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 48
    from mal_tpu.dynamic.warp import splat_depth
    img = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    depth = (5.0 + 3.0 * rng.rand(B, H, W)).astype(np.float32)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T[:, 0, 3], T[:, 2, 3] = 0.05, -0.2
    K = _camera(B, H, W)
    args = (jnp.asarray(depth), jnp.asarray(T), jnp.asarray(K))

    direct = forward_warp(jnp.asarray(img), *args, upscale=3)
    inv = splat_depth(*args, upscale=3)
    shared = forward_warp(jnp.asarray(img), *args, upscale=3, inv_map=inv)
    for a, b in zip(direct, shared):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_splat_depth_dilate_fast_path():
    """The 1x-splat + 3x3 max-dilation fast path (cfg.domd_splat_dilate):
    coverage is a superset of the exact x3 splat's, the moved object's
    bbox is unchanged, and inverse depths agree on the common cover."""
    from mal_tpu.dynamic.warp import splat_depth
    B, H, W = 1, 48, 64
    K = _camera(B, H, W)
    yy = np.linspace(0, 1, H, dtype=np.float32)[:, None]
    depth = np.broadcast_to(8.0 + 4.0 * yy, (B, H, W)).astype(np.float32)
    img = np.zeros((B, H, W, 3), np.float32)
    img[0, 14:30, 20:44] = 0.8
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T[:, 0, 3], T[:, 2, 3] = 0.08, -0.4

    args = (jnp.asarray(depth), jnp.asarray(T), jnp.asarray(K))
    inv_e = np.asarray(splat_depth(*args, upscale=3))
    inv_d = np.asarray(splat_depth(*args, upscale=3, dilate=True))

    cov_e, cov_d = inv_e > 0, inv_d > 0
    # dilation may only ADD coverage (hole filling), never lose it
    assert (cov_d | ~cov_e).all()
    common = cov_e & cov_d
    np.testing.assert_allclose(inv_d[common], inv_e[common], rtol=0.05)

    w_e, _, _ = forward_warp(jnp.asarray(img), *args, upscale=3)
    w_d, _, _ = forward_warp(jnp.asarray(img), *args, upscale=3, dilate=True)
    w_e, w_d = np.asarray(w_e), np.asarray(w_d)
    ye, xe = np.where(w_e[0, :, :, 0] > 0)
    yd, xd = np.where(w_d[0, :, :, 0] > 0)
    # same landing bbox (+-1 px), >= as many covered object pixels
    assert abs(ye.min() - yd.min()) <= 1 and abs(ye.max() - yd.max()) <= 1
    assert abs(xe.min() - xd.min()) <= 1 and abs(xe.max() - xd.max()) <= 1
    assert len(yd) >= len(ye)


def test_domd_splat_dilate_flag_resolution():
    """domd_splat_dilate=None resolves to exact off-TPU (parity oracles run
    on CPU unchanged); explicit True engages the dilated splat."""
    from mal_tpu.config import Config
    from mal_tpu.dynamic.domd import domd_warp_inputs

    B, H, W = 1, 24, 32
    rng = np.random.RandomState(2)
    img0 = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    doj = np.zeros((B, H, W), np.float32)
    doj[:, 8:16, 10:22] = 1.0
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0], K4[1, 1], K4[0, 2], K4[1, 2] = 0.58 * W, 1.92 * H, W / 2, H / 2
    batch = {
        "color": {"0": jnp.asarray(img0), "-1": jnp.asarray(img0),
                  "1": jnp.asarray(img0)},
        "color_aug": {"0": jnp.asarray(img0)},
        "doj_mask": jnp.asarray(doj),
        "doj_mask-1": jnp.asarray(doj), "doj_mask+1": jnp.asarray(doj),
        "K": jnp.asarray(np.broadcast_to(K4, (B, 4, 4)).copy()),
    }
    disp = jnp.full((B, H, W, 1), 0.3, jnp.float32)
    T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T[:, 0, 3] = 0.1
    T = jnp.asarray(T)
    lookup = img0[:, None]
    aug = jnp.zeros((B,))

    def run(**kw):
        cfg = Config(height=H, width=W, batch_size=B, method="dynamicdepth",
                     **kw)
        return domd_warp_inputs(cfg, batch, disp, T, T, aug,
                                jnp.asarray(lookup))

    auto = run()                       # None -> exact on CPU
    exact = run(domd_splat_dilate=False)
    for a, b in zip(auto, exact):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the dilated variant runs and produces the same shapes
    dil = run(domd_splat_dilate=True)
    for a, b in zip(dil, exact):
        assert np.asarray(a).shape == np.asarray(b).shape
