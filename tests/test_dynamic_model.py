"""DynamicDepth composed model + train step (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.dynamic.model import DynDepthModel, doj_metrics
from mal_tpu.dynamic.step import make_dynamic_train_step
from mal_tpu.train.state import create_train_state, make_optimizer

CFG = Config(height=64, width=96, num_depth_bins=16, batch_size=2,
             method="dynamicdepth", cv_min=True, cv_set_1=True,
             cv_pool_th=0.15, loss_blc=False, use_ensemble=False)


def _batch_with_doj(cfg, rng, B=2):
    batch = dict(synthetic_batch(cfg, rng, batch_size=B))
    H, W = cfg.height, cfg.width
    doj = np.zeros((B, H, W), np.float32)
    doj[:, 20:40, 30:60] = 1.0
    batch["doj_mask"] = jnp.asarray(doj)
    batch["doj_mask-1"] = jnp.asarray(np.roll(doj, -4, axis=2))
    batch["doj_mask+1"] = jnp.asarray(np.roll(doj, 4, axis=2))
    return batch


@pytest.fixture(scope="module")
def setup():
    cfg = CFG
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = _batch_with_doj(cfg, rng)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.1),
                           jnp.asarray(10.0), rng, train=True)
    return cfg, model, batch, variables


@pytest.mark.slow
def test_dyn_model_forward_shapes(setup):
    cfg, model, batch, variables = setup
    out = model.apply(variables, batch, jnp.asarray(0.1), jnp.asarray(10.0),
                      jax.random.PRNGKey(1), train=False, mutable=False)
    H, W = cfg.height, cfg.width
    assert out["disp"].shape == (2, H, W, 1)
    assert out["mono_disp"].shape == (2, H, W, 1)
    assert out["domd_color/-1"].shape == (2, H, W, 3)
    for k, v in out.items():
        assert bool(jnp.isfinite(v).all()), k


@pytest.mark.slow
def test_dyn_model_domd_blanks_moved_objects(setup):
    cfg, model, batch, variables = setup
    out = model.apply(variables, batch, jnp.asarray(0.1), jnp.asarray(10.0),
                      jax.random.PRNGKey(1), train=False, mutable=False)
    # doj_mask-1 region is blanked unless the forward-warped object covers it
    dm1 = np.asarray(batch["doj_mask-1"][0]) == 1
    c = np.asarray(out["domd_color/-1"][0])
    orig = np.asarray(batch["color"]["-1"][0])
    # at least some masked pixels must differ from the original frame
    assert np.abs(c[dm1] - orig[dm1]).max() > 0.1


@pytest.mark.slow
def test_dyn_train_step(setup):
    cfg, model, batch, variables = setup
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, DynDepthModel(cfg), rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_dynamic_train_step(cfg, DynDepthModel(cfg), tx))
    state1, metrics = step(state, batch, jax.random.PRNGKey(2), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1


def test_doj_from_instances_unions_dynamic_classes_only():
    from mal_tpu.segment.doj import doj_from_instances
    from mal_tpu.segment.instances import Instances

    masks = np.zeros((1, 3, 8, 8), np.float32)
    masks[0, 0, :4] = 1.0        # car, high score -> in
    masks[0, 1, 4:] = 1.0        # non-dynamic class -> out
    masks[0, 2, :, :4] = 1.0     # person, low score -> out
    inst = Instances(
        masks=jnp.asarray(masks),
        classes=jnp.asarray([[2, 9, 0]], jnp.int32),
        scores=jnp.asarray([[0.9, 0.9, 0.2]]),
        valid=jnp.asarray([[True, True, True]]))
    doj = np.asarray(doj_from_instances(inst, score_threshold=0.5))
    assert doj.shape == (1, 8, 8)
    np.testing.assert_array_equal(doj[0, :4], 1.0)
    np.testing.assert_array_equal(doj[0, 4:], 0.0)


@pytest.mark.slow
def test_online_doj_step_matches_precomputed(setup):
    """cfg.online_doj with a doj_fn that returns the same masks as the
    dataset's precomputed ones -> identical training step."""
    cfg, model, batch, variables = setup
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(cfg)

    ref_step = jax.jit(make_dynamic_train_step(cfg, DynDepthModel(cfg), tx))
    state = create_train_state(cfg, DynDepthModel(cfg), rng, batch)
    _, m_ref = ref_step(state, batch, jax.random.PRNGKey(2), jnp.zeros(()))

    masks = {"0": batch["doj_mask"], "-1": batch["doj_mask-1"],
             "1": batch["doj_mask+1"]}

    def fake_doj_fn(seg_variables, images):
        # dispatch on which frame was passed (frames differ in the batch)
        out = masks["0"]
        for f, m in masks.items():
            same = jnp.all(images == batch["color"][f])
            out = jnp.where(same, m, out)
        return out

    cfg_online = cfg.replace(online_doj=True)
    online_batch = {k: v for k, v in batch.items()
                    if not k.startswith("doj_mask")}
    online_step = jax.jit(make_dynamic_train_step(
        cfg_online, DynDepthModel(cfg_online), tx, doj_fn=fake_doj_fn))
    state2 = create_train_state(cfg_online, DynDepthModel(cfg_online), rng,
                                batch)
    _, m_online = online_step(state2, online_batch, jax.random.PRNGKey(2),
                              jnp.zeros(()), None)
    np.testing.assert_allclose(float(m_online["loss"]),
                               float(m_ref["loss"]), rtol=1e-6)


def test_doj_metrics_restricted_to_mask():
    gt = jnp.full((1, 8, 8), 10.0)
    pred = jnp.full((1, 8, 8), 10.0)
    pred = pred.at[:, :4].set(20.0)  # wrong in the top half
    doj_bottom = jnp.zeros((1, 8, 8)).at[:, 4:].set(1.0)
    m = doj_metrics(pred, gt, doj_bottom)
    assert float(m["doj/abs_rel"]) == 0.0
    doj_top = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    m2 = doj_metrics(pred, gt, doj_top)
    assert float(m2["doj/abs_rel"]) == 1.0


@pytest.mark.slow
def test_dyn_train_step_bf16_fast_mode(setup):
    """TPU fast-training mode (compute_dtype=bfloat16, round 4): the
    DynamicDepth trunks run bf16 like MALModel's. Same param tree, loss
    finite and close to the fp32 step's."""
    cfg, _, batch, _ = setup
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, DynDepthModel(cfg), rng, batch)
    state16 = create_train_state(cfg16, DynDepthModel(cfg16), rng, batch)
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(state16.params))
    tx = make_optimizer(cfg16)
    step = jax.jit(make_dynamic_train_step(cfg16, DynDepthModel(cfg16), tx))
    # fp32 params run through the bf16 step (params stay fp32 in fast mode)
    _, m16 = step(state16, batch, jax.random.PRNGKey(2), jnp.zeros(()))
    ref_step = jax.jit(make_dynamic_train_step(cfg, DynDepthModel(cfg),
                                               make_optimizer(cfg)))
    _, m32 = ref_step(state, batch, jax.random.PRNGKey(2), jnp.zeros(()))
    l16, l32 = float(m16["loss"]), float(m32["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) < 0.05 * max(abs(l32), 1e-3)


@pytest.mark.parametrize("cv_min,set_1", [(True, True), (False, False),
                                          (True, False), (False, True)])
def test_occlusion_cv_pallas_matches_xla(cv_min, set_1):
    """The Pallas occlusion-aware cost volume (round 5 — occ mask warped as
    an extra feature channel) must match the XLA grid_sample twin in every
    set_1/cv_min combination, including the ones-init saturation and
    missing-to-max quirks. Interpret mode on CPU."""
    from mal_tpu.dynamic.cost_volume import (
        occlusion_aware_cost_volume, occlusion_aware_cost_volume_pallas)

    B, F, h, w, C, D = 2, 2, 16, 32, 8, 8
    H, W = 4 * h, 4 * w
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.uniform(0, 1, (B, h, w, C)).astype(np.float32))
    look = jnp.asarray(rng.uniform(0, 1, (B, F, h, w, C)).astype(np.float32))
    # nontrivial pose: small rotation + translation; frame 1 of item 1 is
    # the all-zero "missing" pose
    pose = np.broadcast_to(np.eye(4, dtype=np.float32), (B, F, 4, 4)).copy()
    th = 0.02
    pose[:, :, 0, 0] = np.cos(th); pose[:, :, 0, 2] = np.sin(th)
    pose[:, :, 2, 0] = -np.sin(th); pose[:, :, 2, 2] = np.cos(th)
    pose[:, :, 0, 3] = 0.1; pose[:, :, 1, 3] = 0.02
    pose[1, 1] = 0.0
    pose = jnp.asarray(pose)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * w, 1.92 * h, w / 2, h / 2
    K = jnp.broadcast_to(jnp.asarray(K), (B, 4, 4))
    inv_K = jnp.linalg.inv(K)
    bins = jnp.linspace(0.8, 6.0, D)
    # lookup images with BLACK (occluded) patches so the occ path fires,
    # and aug item 1 disables the substitution there
    imgs = rng.uniform(0.2, 1.0, (B, F, H, W, 3)).astype(np.float32)
    imgs[:, :, 20:40, 40:90] = 0.0
    imgs = jnp.asarray(imgs)
    aug = jnp.asarray([0.0, 1.0])

    kw = dict(cv_min=cv_min, set_1=set_1, pool_th=0.7)
    ref_cost, ref_miss = occlusion_aware_cost_volume(
        cur, look, pose, K, inv_K, bins, imgs, aug, pool=False,
        chunk=D // 2, **kw)
    pal_cost, pal_miss = occlusion_aware_cost_volume_pallas(
        cur, look, pose, K, inv_K, bins, imgs, aug, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(pal_cost), np.asarray(ref_cost),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(pal_miss > 0.5),
                                  np.asarray(ref_miss > 0.5))
