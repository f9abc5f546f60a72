"""DualRefine train step smoke test (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.dualref.model import DEQDepthPose
from mal_tpu.dualref.step import make_dualref_train_step
from mal_tpu.train.state import TrainState, DepthBinTracker, make_optimizer
from mal_tpu.losses import LossBalancerState

CFG = Config(height=64, width=96, deq_iters=2, corr_radius=2, corr_levels=2,
             num_pose_iter=1, method="dualrefine", frame_ids=(0, -1),
             batch_size=2)


@pytest.mark.slow
def test_dualref_train_step():
    cfg = CFG
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=1)

    variables = model.init(rng, batch["color_aug"]["0"],
                           batch["color_aug"]["-1"], batch["K"],
                           invert=True, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       bins=DepthBinTracker.create(),
                       balancer=LossBalancerState.create())

    step = jax.jit(make_dualref_train_step(cfg, model, tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["pose_loss"]))
    assert int(state1.step) == 1
    # global parameter movement (pose nets for unused sides stay at zero grad)
    diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)))
    assert diff > 0.0
    # the update block (refinement student) specifically must move
    ub_diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in
                  zip(jax.tree.leaves(state.params["update_block"]),
                      jax.tree.leaves(state1.params["update_block"])))
    assert ub_diff > 0.0


@pytest.mark.slow
def test_freeze_backbone_trains_student_only():
    """freeze_teacher_epoch partition (`depth_pose.py:84-87` freeze_backbone):
    only conv2/context/hidden/update_block move."""
    cfg = CFG
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=1)
    variables = model.init(rng, batch["color_aug"]["0"],
                           batch["color_aug"]["-1"], batch["K"],
                           invert=True, train=True)
    params = variables["params"]
    tx = make_optimizer(cfg, freeze_backbone=True)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(params),
                       bins=DepthBinTracker.create(),
                       balancer=LossBalancerState.create())
    step = jax.jit(make_dualref_train_step(cfg, model, tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))

    def moved(name):
        return sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
            jax.tree.leaves(state.params[name]),
            jax.tree.leaves(state1.params[name])))

    for frozen in ("cnet", "decoder", "pose_trunk_0", "pose_weights",
                   "reproject_2"):
        assert moved(frozen) == 0.0, frozen
    assert moved("update_block") > 0.0
    assert moved("context") > 0.0


@pytest.mark.slow
def test_n_losses_trajectory_supervision():
    """--n_losses > 1 supervises multiple trajectory states: the model emits
    disp_0_1..disp_0_n and the step trains on all of them.

    deq-lib tap semantics (validated by the gradient oracle): with
    n_losses=2 the taps sit at steps [f_thres//2, f_thres], and taps at
    step <= 2 silently drop (the solver loop starts at k=2), so f_thres
    must be >= 6 for BOTH taps to fire — with f_thres=4 the reference
    emits a single supervised state."""
    cfg = CFG.replace(deq_n_losses=2, deq_iters=6)
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=1)
    variables = model.init(rng, batch["color_aug"]["0"],
                           batch["color_aug"]["-1"], batch["K"],
                           invert=True, train=True)
    out, _ = model.apply(variables, batch["color_aug"]["0"],
                         batch["color_aug"]["-1"], batch["K"], invert=True,
                         train=True,
                         mutable=["batch_stats"])[0]
    assert "disp_0_1" in out and "disp_0_2" in out
    assert "disp_0_3" not in out

    params = variables["params"]
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(params),
                       bins=DepthBinTracker.create(),
                       balancer=LossBalancerState.create())
    step = jax.jit(make_dualref_train_step(cfg, model, tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))

    # eval still emits exactly one refined state
    out_eval, _ = model.apply(variables, batch["color_aug"]["0"],
                              batch["color_aug"]["-1"], batch["K"],
                              invert=True, train=False, mutable=False)
    assert "disp_0_1" in out_eval and "disp_0_2" not in out_eval


def test_bin_tracker_mean_median_oracle():
    """DualRefine's mean/median depth-bin EMAs vs the reference's own torch
    math (`dualrefine/trainer.py:357-372`): the mean reduces only batch
    element 0, the median is a lower-middle median-of-row-medians averaged
    over the batch, both EMA'd at 0.99."""
    import torch

    rng = np.random.RandomState(7)
    for B, H, W in [(2, 6, 10), (3, 5, 9)]:  # even and odd lengths
        d = rng.rand(B, H, W, 1).astype(np.float32) * 5 + 0.2
        d_t = torch.from_numpy(d[..., 0][:, None])  # (B, 1, H, W)

        mean_ref = d_t.mean(-1)[0].mean(-1)[0].mean().item()
        median_ref = d_t.median(-1)[0].median(-1)[0].mean().item()

        tr = DepthBinTracker.create()
        tr2 = tr.update(jnp.asarray(d), 0.1, ema=0.99, track_stats=True)
        np.testing.assert_allclose(float(tr2.mean_depth),
                                   1.0 * 0.99 + mean_ref * 0.01, rtol=1e-5)
        np.testing.assert_allclose(float(tr2.median_depth),
                                   1.0 * 0.99 + median_ref * 0.01, rtol=1e-5)

    # without track_stats (manydepth/dynamicdepth) the stats stay put
    tr3 = DepthBinTracker.create().update(jnp.asarray(d), 0.1)
    assert float(tr3.mean_depth) == 1.0 and float(tr3.median_depth) == 1.0
