"""Pareto (MGDA) two-task gradient weighting (reconstruction of the
reference's missing `manydepth/pareto.py`; see `mal_tpu/pareto.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.pareto import pareto_combine_grads, pareto_weights_2task


def _tree(vals):
    return {"a": jnp.asarray(vals[0]), "b": {"c": jnp.asarray(vals[1])}}


def _numeric_min_norm(g0, g1, c0, c1):
    """Brute-force the constrained minimizer of ||(1-w1) g0 + w1 g1||^2."""
    ws = np.linspace(c1, 1.0 - c0, 20001)
    norms = [np.sum(((1 - w) * g0 + w * g1) ** 2) for w in ws]
    return ws[int(np.argmin(norms))]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_numeric_min_norm(seed):
    rng = np.random.RandomState(seed)
    g0 = rng.randn(40)
    g1 = rng.randn(40)
    w0, w1 = pareto_weights_2task(
        _tree([g0[:20], g0[20:]]), _tree([g1[:20], g1[20:]]))
    w1_num = _numeric_min_norm(g0, g1, 0.1, 0.3)
    assert abs(float(w1) - w1_num) < 1e-3
    assert abs(float(w0) + float(w1) - 1.0) < 1e-6


def test_bounds_respected():
    # g1 tiny -> unconstrained optimum puts ~all weight on task 1; the
    # c0=0.1 floor must keep task 0 alive
    g0 = _tree([np.ones(8) * 10.0, np.ones(8) * 10.0])
    g1 = _tree([np.ones(8) * 1e-3, np.ones(8) * 1e-3])
    w0, w1 = pareto_weights_2task(g0, g1)
    assert float(w0) == pytest.approx(0.1)
    assert float(w1) == pytest.approx(0.9)
    # and symmetrically the c1=0.3 floor
    w0b, w1b = pareto_weights_2task(g1, g0)
    assert float(w1b) == pytest.approx(0.3)


def test_identical_grads_degenerate():
    g = _tree([np.ones(4), np.ones(4)])
    w0, w1 = pareto_weights_2task(g, g)
    assert np.isfinite(float(w0)) and np.isfinite(float(w1))
    assert abs(float(w0) + float(w1) - 1.0) < 1e-6


def test_combine_is_weighted_sum_and_jittable():
    rng = np.random.RandomState(7)
    g0 = _tree([rng.randn(6), rng.randn(3)])
    g1 = _tree([rng.randn(6), rng.randn(3)])
    grads, w0, w1 = jax.jit(pareto_combine_grads)(g0, g1)
    np.testing.assert_allclose(
        np.asarray(grads["b"]["c"]),
        float(w0) * np.asarray(g0["b"]["c"])
        + float(w1) * np.asarray(g1["b"]["c"]), rtol=1e-6)


# ---------------------------------------------------------------------------
# train-step integration (cfg.pareto=True)
# ---------------------------------------------------------------------------

def test_pareto_train_step_grads_and_metrics():
    from mal_tpu.config import Config
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_loss_fn, make_train_step

    cfg = Config(height=64, width=96, num_depth_bins=16, batch_size=2,
                 pareto=True, loss_blc=False)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step_fn = jax.jit(make_train_step(cfg, model, tx))

    step_rng = jax.random.PRNGKey(1)
    state1, metrics = step_fn(state, batch, step_rng, jnp.zeros(()))

    w0, w1 = float(metrics["w_ori"]), float(metrics["w_distil"])
    c0, c1 = cfg.pareto_c
    assert abs(w0 + w1 - 1.0) < 1e-5
    assert c0 - 1e-6 <= w0 <= 1.0 - c1 + 1e-6
    assert c1 - 1e-6 <= w1 <= 1.0 - c0 + 1e-6
    assert np.isfinite(float(metrics["loss"]))
    # the quirky reference log value: w0 x (w0*multi + w1*distil)
    assert np.isfinite(float(metrics["ori_loss"]))
    # params moved (first-step LR is the warmup init_lr=1e-10, so the
    # movement is tiny but must be nonzero)
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state1.params)[0]
    assert np.any(np.asarray(p0) != np.asarray(p1))

    # the applied gradient equals w0*g_multi + w1*g_distil + g_mono2
    # computed independently with jax.grad over each component
    loss_fn = make_loss_fn(cfg, model)
    rng_model, rng_noise = jax.random.split(step_rng)

    def comp(params, idx):
        _, aux = loss_fn(params, state.batch_stats, state.bins.min_depth,
                         state.bins.max_depth, state.balancer, batch,
                         rng_model, rng_noise, jnp.zeros(()))
        return aux["components"][idx]

    g = [jax.grad(lambda p, i=i: comp(p, i))(state.params)
         for i in range(3)]
    expect_g = jax.tree.map(lambda a, b, c: w0 * a + w1 * b + c,
                            g[0], g[1], g[2])
    # reconstruct the update through the same optimizer
    import optax
    updates, _ = tx.update(expect_g, state.opt_state, state.params)
    expect_params = optax.apply_updates(state.params, updates)
    got = np.asarray(jax.tree.leaves(state1.params)[0])
    want = np.asarray(jax.tree.leaves(expect_params)[0])
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_pareto_overrides_loss_blc():
    # if/elif in the reference (`loss_utils.py:256-266`): pareto wins
    from mal_tpu.config import Config
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    cfg = Config(height=64, width=96, num_depth_bins=16, batch_size=2,
                 pareto=True, loss_blc=True)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    step_fn = jax.jit(make_train_step(cfg, model, make_optimizer(cfg)))
    state1, metrics = step_fn(state, batch, jax.random.PRNGKey(1),
                              jnp.zeros(()))
    # balancer untouched (pareto branch) and weights are the MGDA ones
    assert float(state1.balancer.count) == 0.0
    assert abs(float(metrics["w_ori"]) + float(metrics["w_distil"]) - 1) < 1e-5
