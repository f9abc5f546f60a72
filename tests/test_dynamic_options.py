"""DynamicDepth option-parity: feature-metric loss, selec_reproj, zero_img,
train_teacher_only (`dynamicdepth/options.py:142-154,298-303`,
`trainer.py:955-963,1058-1065,1135-1156,138-141`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mal_tpu import losses
from mal_tpu.config import Config


def test_feature_metric_loss_matches_torch_reference():
    rng = np.random.RandomState(0)
    feat = rng.normal(0, 1, (2, 8, 12, 16)).astype(np.float32)
    img = rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32)

    ours = float(losses.feature_metric_loss(jnp.asarray(feat),
                                            jnp.asarray(img), 0.01, 0.02))

    def tgrad(d):
        return d[:, :, :, 1:] - d[:, :, :, :-1], d[:, :, 1:] - d[:, :, :-1]

    tf = torch.from_numpy(feat).permute(0, 3, 1, 2)
    ti = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), (8, 12),
                       mode="area")
    f_dx, f_dy = tgrad(tf)
    i_dx, i_dy = tgrad(ti)
    f_dxx, f_dxy = tgrad(f_dx)
    f_dyx, f_dyy = tgrad(f_dy)
    i_dxx, i_dxy = tgrad(i_dx)
    i_dyx, i_dyy = tgrad(i_dy)

    def t(fg, ig):
        return torch.mean(fg.abs() * torch.exp(-ig.abs().mean(1, True)))

    s1 = t(f_dx, i_dx) + t(f_dy, i_dy)
    s2 = t(f_dxx, i_dxx) + t(f_dxy, i_dxy) + t(f_dyx, i_dyx) + t(f_dyy, i_dyy)
    ref = float(-0.01 * s1 + 0.02 * s2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_selec_reproj_substitution():
    B, H, W = 1, 4, 6
    r0 = jnp.full((B, H, W, 1), 0.8)
    r1 = jnp.full((B, H, W, 1), 0.3)
    reproj_all = jnp.concatenate([r0, r1], axis=-1)

    w0 = jnp.ones((B, H, W, 3))
    w1 = jnp.ones((B, H, W, 3))
    # frame 0 black in the top row; both black at (1, 0)
    w0 = w0.at[:, 0].set(0.0)
    w0 = w0.at[:, 1, 0].set(0.0)
    w1 = w1.at[:, 1, 0].set(0.0)

    out = losses.apply_selec_reproj(reproj_all, [w0, w1])
    assert float(out[0, 2, 2, 0]) == pytest.approx(0.3)   # normal min
    assert float(out[0, 0, 2, 0]) == pytest.approx(0.3)   # frame0 black -> r1
    assert float(out[0, 1, 0, 0]) == 0.0                  # both black -> 0

    # frame 1 black somewhere -> r0 substituted
    w1b = w1.at[:, 3, 5].set(0.0)
    out2 = losses.apply_selec_reproj(reproj_all, [w0, w1b])
    assert float(out2[0, 3, 5, 0]) == pytest.approx(0.8)


def test_zero_img_reprojection_blanks_black_pred():
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.uniform(0.3, 1, (1, 8, 8, 3)).astype(np.float32))
    pred = jnp.zeros((1, 8, 8, 3))
    # fully black pred: plain loss is large, zero_img loss compares 0 vs 0
    plain = losses.reprojection_loss(pred, target)
    zi = losses.reprojection_loss_zero_img(pred, target)
    assert float(jnp.mean(plain)) > 0.05
    assert float(jnp.mean(zi)) == pytest.approx(0.0, abs=1e-7)


@pytest.mark.slow
def test_train_teacher_only_freezes_student():
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.dynamic.model import DynDepthModel
    from mal_tpu.dynamic.step import make_dynamic_train_step
    from mal_tpu.train.state import create_train_state, make_optimizer

    cfg = Config(height=64, width=96, num_depth_bins=16, batch_size=2,
                 method="dynamicdepth", train_teacher_only=True,
                 feat_loss=True, selec_reproj=True, zero_img=True)
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_dynamic_train_step(cfg, model, tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["feat_loss"]))

    def moved(name):
        return sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(state.params[name]),
            jax.tree.leaves(state1.params[name])))

    assert moved("encoder") == 0.0 and moved("depth") == 0.0
    assert moved("mono_encoder") > 0.0

def test_disable_automasking_unmasked_mean():
    """--disable_automasking: no identity maps; the reprojection loss is the
    plain mean of the per-pixel min map (`dynamicdepth/trainer.py:1030,
    1067` identity=None -> ones mask)."""
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    B, H, W = 2, 8, 12
    disp = jax.random.uniform(k1, (B, H, W, 1))
    color = jax.random.uniform(k2, (B, H, W, 3))
    warped = [jax.random.uniform(k3, (B, H, W, 3)),
              jax.random.uniform(k4, (B, H, W, 3))]
    identity = [color * 0.9, color * 1.1]

    out = losses.mono_losses(rng, disp, color, warped, identity,
                             disable_automasking=True)
    expected = jnp.mean(jnp.min(jnp.concatenate(
        [losses.reprojection_loss(p, color) for p in warped], -1),
        axis=-1, keepdims=True))
    np.testing.assert_allclose(float(out.reproj_loss), float(expected),
                               rtol=1e-6)
    # and it differs from the automasked loss
    masked = losses.mono_losses(rng, disp, color, warped, identity)
    assert float(out.reproj_loss) != float(masked.reproj_loss)


def test_no_reproj_doj_blanks_landing_zone():
    """--no_reproj_doj: the warped-object landing zone is blanked instead of
    infilled (`dynamicdepth/trainer.py:507-511`) — wherever the two modes
    differ, the flagged output is zero."""
    from mal_tpu.dynamic.domd import domd_warp_inputs

    rng = jax.random.PRNGKey(3)
    ks = jax.random.split(rng, 8)
    B, H, W = 2, 16, 24
    batch = {
        "color": {"0": jax.random.uniform(ks[0], (B, H, W, 3)) + 0.1,
                  "-1": jax.random.uniform(ks[1], (B, H, W, 3)) + 0.1,
                  "1": jax.random.uniform(ks[2], (B, H, W, 3)) + 0.1},
        "color_aug": {"0": jax.random.uniform(ks[3], (B, H, W, 3)) + 0.1},
        "K": jnp.broadcast_to(jnp.asarray(
            [[W * 0.6, 0, W / 2, 0], [0, H * 1.2, H / 2, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32), (B, 4, 4)),
        "doj_mask": (jax.random.uniform(ks[4], (B, H, W)) > 0.6).astype(
            jnp.float32),
        "doj_mask-1": (jax.random.uniform(ks[5], (B, H, W)) > 0.6).astype(
            jnp.float32),
        "doj_mask+1": (jax.random.uniform(ks[6], (B, H, W)) > 0.6).astype(
            jnp.float32),
    }
    disp = jax.random.uniform(ks[7], (B, H, W, 1)) * 0.5 + 0.2
    T = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 0, 3].set(0.05)
    aug = jnp.zeros((B,))
    lookup = batch["color"]["-1"][:, None]

    cfg0 = Config(height=H, width=W, method="dynamicdepth")
    cfg1 = cfg0.replace(no_reproj_doj=True)
    m1_a, p1_a, _ = domd_warp_inputs(cfg0, batch, disp, T, T, aug, lookup)
    m1_b, p1_b, _ = domd_warp_inputs(cfg1, batch, disp, T, T, aug, lookup)
    for a, b in ((m1_a, m1_b), (p1_a, p1_b)):
        diff = np.asarray(a != b)
        assert diff.any()  # the warp landed somewhere
        np.testing.assert_array_equal(np.asarray(b)[diff], 0.0)


@pytest.mark.slow
def test_tempv2_and_no_multi_loss_total_composition():
    """--tempv2 drops the mono losses from the total; --no_multi_loss keeps
    ONLY them (`dynamicdepth/trainer.py:631-643` merge loop). With distil
    off and identical forward passes: base = tempv2 + no_multi."""
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.dynamic.model import DynDepthModel
    from mal_tpu.dynamic.step import make_dynamic_loss_fn
    from mal_tpu.train.state import create_train_state

    base = Config(height=64, width=96, num_depth_bins=16, batch_size=2,
                  method="dynamicdepth", distil=False)
    model = DynDepthModel(base)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(base, rng, batch_size=2)
    state = create_train_state(base, model, rng, batch)

    def total(cfg):
        fn = jax.jit(lambda p, bs: make_dynamic_loss_fn(cfg, model)(
            p, bs, state.bins.min_depth, state.bins.max_depth, batch,
            jax.random.PRNGKey(1), jax.random.PRNGKey(2))[0])
        return float(fn(state.params, state.batch_stats))

    t_base = total(base)
    t_v2 = total(base.replace(tempv2=True))
    t_mono = total(base.replace(no_multi_loss=True))
    np.testing.assert_allclose(t_base, t_v2 + t_mono, rtol=1e-5)
    assert t_v2 > 0 and t_mono > 0
