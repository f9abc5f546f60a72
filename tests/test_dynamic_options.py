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