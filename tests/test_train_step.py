"""End-to-end train-step tests (tiny config, single CPU device)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import MALModel
from mal_tpu.train.state import create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step

CFG = Config(height=64, width=96, num_depth_bins=16, batch_size=2)


@pytest.fixture(scope="module")
def setup():
    cfg = CFG
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step_fn = jax.jit(make_train_step(cfg, model, tx))
    return cfg, model, batch, state, step_fn


def test_two_steps_update_everything(setup):
    cfg, model, batch, state, step_fn = setup
    rng = jax.random.PRNGKey(1)

    state1, metrics1 = step_fn(state, batch, rng, jnp.zeros(()))
    state2, metrics2 = step_fn(state1, batch, jax.random.PRNGKey(2), jnp.zeros(()))

    assert np.isfinite(float(metrics1["loss"]))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state2.step) == 2

    # parameters actually moved
    p0 = jax.tree.leaves(state.params)[0]
    p2 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))

    # depth-bin EMA updated away from its initialization
    assert bool(state2.bins.updated)
    assert float(state2.bins.max_depth) != 10.0

    # loss balancer accumulated two iterations and initialized weights
    assert float(state2.balancer.count) == 2.0
    assert bool(state2.balancer.initialized)
    w = np.asarray(state2.balancer.w)
    assert np.all(w > 0)

    # batch stats changed (BN in train mode)
    b0 = jax.tree.leaves(state.batch_stats)[0]
    b2 = jax.tree.leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(b0), np.asarray(b2))


def test_frozen_teacher_keeps_teacher_params(setup):
    cfg, model, batch, state, _ = setup
    fcfg = cfg.replace(freeze_teacher_and_pose=True, adaptive_bins=False)
    ftx = make_optimizer(fcfg)
    fstate = state.replace(opt_state=ftx.init(state.params))
    fstep = jax.jit(make_train_step(fcfg, model, ftx))
    state1, _ = fstep(fstate, batch, jax.random.PRNGKey(3), jnp.zeros(()))

    def norm_diff(tree_a, tree_b):
        return sum(float(jnp.sum(jnp.abs(a - b)))
                   for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)))

    # teacher + pose untouched; student moved
    for frozen_key in ("mono_encoder", "mono_depth", "pose_encoder", "pose"):
        assert norm_diff(state1.params[frozen_key], fstate.params[frozen_key]) == 0.0
    assert norm_diff(state1.params["encoder"], fstate.params["encoder"]) > 0.0
    assert norm_diff(state1.params["depth"], fstate.params["depth"]) > 0.0


def test_no_distil_path(setup):
    cfg, model, batch, state, _ = setup
    ncfg = cfg.replace(distil=False, loss_blc=False)
    ntx = make_optimizer(ncfg)
    nstate = state.replace(opt_state=ntx.init(state.params))
    nstep = jax.jit(make_train_step(ncfg, model, ntx))
    state1, metrics = nstep(nstate, batch, jax.random.PRNGKey(4), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    # without balancing, loss == ori_loss
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics["ori_loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_train_step_bf16_fast_mode():
    """TRAIN_FAST_SETTINGS (bf16 trunks + bf16 warp payload) must train:
    finite loss near the fp32 value, moving parameters."""
    from mal_tpu.config import TRAIN_FAST_SETTINGS

    cfg = CFG.replace(**TRAIN_FAST_SETTINGS)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))

    cfg32 = CFG
    model32 = MALModel(cfg32)
    state32 = create_train_state(cfg32, model32, rng, batch)
    step32 = jax.jit(make_train_step(cfg32, model32, make_optimizer(cfg32)))
    _, m32 = step32(state32, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    # same init/seed: bf16 loss within 2% of fp32
    np.testing.assert_allclose(float(metrics["loss"]), float(m32["loss"]),
                               rtol=0.02)


def test_no_ssim_pure_l1(setup):
    """--no_ssim (`manydepth/trainer.py:1217-1218`): the photometric loss
    drops the SSIM term everywhere (mono, multi, ensemble min-reprojection).
    Regression guard: round-3 left `reproj_fn` plumbing in step.py without
    the losses.py implementations, so the default bench config crashed."""
    from mal_tpu import losses

    cfg, model, batch, state, step_fn = setup
    # kernel-level: min_reprojection honors reproj_fn
    rng = jax.random.PRNGKey(7)
    a = jax.random.uniform(rng, (2, 8, 12, 3))
    b = jax.random.uniform(jax.random.PRNGKey(8), (2, 8, 12, 3))
    t = jax.random.uniform(jax.random.PRNGKey(9), (2, 8, 12, 3))
    got = losses.min_reprojection([a, b], t,
                                  reproj_fn=losses.l1_reprojection_loss)
    want = jnp.minimum(jnp.mean(jnp.abs(t - a), -1, keepdims=True),
                       jnp.mean(jnp.abs(t - b), -1, keepdims=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # step-level: the full default path (distil + ensemble) runs and the
    # loss actually differs from the SSIM+L1 default
    ncfg = cfg.replace(no_ssim=True)
    ntx = make_optimizer(ncfg)
    nstate = state.replace(opt_state=ntx.init(state.params))
    nstep = jax.jit(make_train_step(ncfg, model, ntx))
    _, metrics = nstep(nstate, batch, jax.random.PRNGKey(4), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    _, m_def = step_fn(state, batch, jax.random.PRNGKey(4), jnp.zeros(()))
    assert float(metrics["loss"]) != float(m_def["loss"])


def test_remat_is_numerically_identical(setup):
    """--set remat=true (jax.checkpoint on the loss pyramids) must be an
    exact program transform: same loss, same gradients, same new params."""
    cfg, model, batch, state, step_fn = setup
    cfg_r = cfg.replace(remat=True)
    model_r = MALModel(cfg_r)  # nn.remat'd encoders — same param tree
    tx = make_optimizer(cfg_r)
    step_r = jax.jit(make_train_step(cfg_r, model_r, tx))

    rng = jax.random.PRNGKey(1)
    s1, m1 = step_fn(state, batch, rng, jnp.zeros(()))
    s1r, m1r = step_r(state, batch, rng, jnp.zeros(()))

    np.testing.assert_allclose(float(m1["loss"]), float(m1r["loss"]),
                               rtol=0, atol=0)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s1r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
