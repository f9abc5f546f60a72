"""Multi-device data-parallel tests on the virtual 8-device CPU mesh —
coverage the reference lacks entirely (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import MALModel
from mal_tpu.parallel import data_parallel_step, make_mesh, replicate, shard_batch
from mal_tpu.train.state import create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step

CFG = Config(height=64, width=96, num_depth_bins=16, batch_size=8,
             no_matching_augmentation=True)  # deterministic across layouts


def _setup(cfg):
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=cfg.batch_size)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    return model, batch, state, tx


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_step_runs_on_8_devices():
    cfg = CFG
    model, batch, state, tx = _setup(cfg)
    mesh = make_mesh(8)
    step = data_parallel_step(make_train_step(cfg, model, tx), mesh)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    rng = replicate(jax.random.PRNGKey(1), mesh)
    epoch = replicate(jnp.zeros(()), mesh)

    new_state, metrics = step(state_r, batch_s, rng, epoch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_dp_matches_single_device():
    """The 8-way sharded step must produce the same numbers as 1 device."""
    cfg = CFG
    model, batch, state, tx = _setup(cfg)
    step_fn = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)
    epoch = jnp.zeros(())

    # single device
    state_1, metrics_1 = jax.jit(step_fn)(state, batch, rng, epoch)

    # 8-way DP
    mesh = make_mesh(8)
    step8 = data_parallel_step(step_fn, mesh)
    state_8, metrics_8 = step8(replicate(state, mesh), shard_batch(batch, mesh),
                               replicate(rng, mesh), replicate(epoch, mesh))

    np.testing.assert_allclose(float(metrics_1["loss"]), float(metrics_8["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(state_1.bins.max_depth),
                               float(state_8.bins.max_depth), rtol=1e-5)
    # spot-check a parameter leaf
    p1 = jax.tree.leaves(state_1.params)[0]
    p8 = jax.tree.leaves(state_8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=5e-5)


@pytest.mark.slow
def test_dp_dynamic_step_runs_on_8_devices():
    from mal_tpu.dynamic.model import DynDepthModel
    from mal_tpu.dynamic.step import make_dynamic_train_step

    cfg = CFG.replace(method="dynamicdepth")
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=cfg.batch_size)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)

    mesh = make_mesh(8)
    step = data_parallel_step(make_dynamic_train_step(cfg, model, tx), mesh)
    new_state, metrics = step(replicate(state, mesh), shard_batch(batch, mesh),
                              replicate(jax.random.PRNGKey(1), mesh),
                              replicate(jnp.zeros(()), mesh))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_dp_dualref_step_runs_on_8_devices():
    from mal_tpu.dualref.model import DEQDepthPose
    from mal_tpu.dualref.step import make_dualref_train_step

    cfg = Config(height=64, width=96, method="dualrefine", frame_ids=(0, -1),
                 batch_size=8, deq_iters=2, corr_radius=2, corr_levels=2)
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=cfg.batch_size)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)

    mesh = make_mesh(8)
    step = data_parallel_step(make_dualref_train_step(cfg, model, tx), mesh)
    new_state, metrics = step(replicate(state, mesh), shard_batch(batch, mesh),
                              replicate(jax.random.PRNGKey(1), mesh),
                              replicate(jnp.zeros(()), mesh))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_shard_batch_rejects_non_divisible_batch():
    """Batch not divisible by the mesh size must fail loudly, not wrap."""
    mesh = make_mesh(8)
    bad = {"x": jnp.ones((6, 4))}
    with pytest.raises(ValueError):
        jax.block_until_ready(shard_batch(bad, mesh))


@pytest.mark.slow
def test_depth_plane_sharded_step_matches_single_device():
    """2-D (data x depth) mesh: the cost volume's depth-plane axis is this
    domain's sequence parallelism (SURVEY.md §5). A 4x2-sharded step must
    reproduce single-device numerics."""
    from mal_tpu.parallel.mesh import make_mesh_2d

    cfg = CFG.replace(num_depth_shards=2, use_pallas=False)
    model, batch, state, tx = _setup(cfg)
    step_fn = make_train_step(cfg, model, tx)
    rng = jax.random.PRNGKey(1)
    epoch = jnp.zeros(())

    state_1, metrics_1 = jax.jit(step_fn)(state, batch, rng, epoch)

    mesh = make_mesh_2d(4, 2)
    assert mesh.devices.shape == (4, 2)
    step_s = data_parallel_step(step_fn, mesh)
    state_s, metrics_s = step_s(replicate(state, mesh),
                                shard_batch(batch, mesh),
                                replicate(rng, mesh), replicate(epoch, mesh))
    np.testing.assert_allclose(float(metrics_1["loss"]),
                               float(metrics_s["loss"]), rtol=2e-4)
    p1 = jax.tree.leaves(state_1.params)[0]
    ps = jax.tree.leaves(state_s.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(ps), atol=5e-5)
