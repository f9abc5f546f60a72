"""Non-default DualRefine DEQ options: --ift/--safe_ift/--b_thres,
--sup_all, --indexing, --stop_mode, --robust_pose_loss
(`dualrefine/options.py:84-230`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.dualref.solvers import anderson_solver_aux, ift_output


def test_ift_gradient_matches_analytic_on_affine_map():
    """For f(z) = A z + b (contraction), the IFT gradient of L = g.z_out
    wrt b is (I - A^T)^(-1) g; the truncated-Neumann ift_output must
    converge to it as b_steps grows."""
    rng = np.random.RandomState(0)
    D = 6
    A = rng.randn(D, D).astype(np.float32)
    A = 0.4 * A / np.abs(np.linalg.eigvals(A)).max()  # spectral radius 0.4
    b = rng.randn(D).astype(np.float32)
    g = rng.randn(D).astype(np.float32)
    z_star = np.linalg.solve(np.eye(D) - A, b)  # exact fixed point

    Aj = jnp.asarray(A)

    def loss(b_param, b_steps):
        def f(z):
            return (z @ Aj.T) + b_param[None, :]
        out = ift_output(f, jnp.asarray(z_star)[None, :], b_steps=b_steps)
        return jnp.sum(out[0] * jnp.asarray(g))

    analytic = np.linalg.solve(np.eye(D) - A.T, g)  # dL/db
    got = np.asarray(jax.grad(loss)(jnp.asarray(b), 50))
    np.testing.assert_allclose(got, analytic, rtol=1e-4, atol=1e-5)

    # truncation error decreases with b_steps
    err1 = np.abs(np.asarray(jax.grad(loss)(jnp.asarray(b), 1)) - analytic).max()
    err10 = np.abs(np.asarray(jax.grad(loss)(jnp.asarray(b), 10)) - analytic).max()
    assert err10 < err1


def test_ift_gradient_matches_deep_unroll():
    """IFT == autodiff through a long unrolled solve (same affine map)."""
    rng = np.random.RandomState(1)
    D = 5
    A = rng.randn(D, D).astype(np.float32)
    A = 0.3 * A / np.abs(np.linalg.eigvals(A)).max()
    b = rng.randn(D).astype(np.float32)
    g = rng.randn(D).astype(np.float32)
    Aj = jnp.asarray(A)

    def unrolled(b_param):
        z = jnp.zeros((1, D))
        for _ in range(80):  # converges to z*, grads through every step
            z = (z @ Aj.T) + b_param[None, :]
        return jnp.sum(z[0] * jnp.asarray(g))

    def via_ift(b_param):
        z_star = jnp.linalg.solve(jnp.eye(D) - Aj, b_param)

        def f(z):
            return (z @ Aj.T) + b_param[None, :]
        out = ift_output(f, z_star[None, :], b_steps=60)
        return jnp.sum(out[0] * jnp.asarray(g))

    g_unroll = np.asarray(jax.grad(unrolled)(jnp.asarray(b)))
    g_ift = np.asarray(jax.grad(via_ift)(jnp.asarray(b)))
    # via_ift additionally differentiates through the z_star solve; subtract
    # nothing — for L linear in z_out both routes give (I-A^T)^-1 g plus the
    # z_star path contribution cut by ift_output's stop_gradient, so compare
    # against the unrolled total directly.
    np.testing.assert_allclose(g_ift, g_unroll, rtol=1e-3, atol=1e-4)


def test_safe_ift_freezes_diverging_adjoint():
    """With an expanding map (|A| > 1) the Neumann series diverges; safe_ift
    must still return finite gradients."""
    D = 4
    A = jnp.eye(D) * 2.0  # expansion: adjoint series diverges

    def loss(b_param, safe):
        def f(z):
            return (z @ A.T) + b_param[None, :]
        out = ift_output(f, jnp.zeros((1, D)), b_steps=120, safe=safe)
        return jnp.sum(out)

    g_safe = np.asarray(jax.grad(loss)(jnp.ones((D,)), True))
    assert np.all(np.isfinite(g_safe))


def test_barron_weight_matches_reference_formula():
    """alpha=0, c=0.1 IRLS weight vs the reference torch math
    (`dualrefine/networks/utils/losses.py:38-82`)."""
    torch = pytest.importorskip("torch")
    from mal_tpu.dualref.pose_update import barron_weight

    x = np.linspace(0, 5, 33).astype(np.float32)

    # reference: scaled_loss(x, barron(alpha=0), c): d1 evaluated at x/c^2,
    # loss_zero_d1 = 2/(y+2)
    c = 0.1
    y = torch.from_numpy(x) / (c * c)
    ref_d1 = 2.0 / (y + 2.0)
    ours = np.asarray(barron_weight(jnp.asarray(x), c))
    np.testing.assert_allclose(ours, ref_d1.numpy(), rtol=1e-6)


def _tiny_cfg(**kw):
    return Config(method="dualrefine", height=64, width=96,
                  frame_ids=(0, -1), batch_size=1, deq_iters=4,
                  use_pallas=False, **kw)


def _run_forward(cfg, train):
    from mal_tpu.dualref.model import DEQDepthPose

    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 64, 96, 3))
    K = jnp.eye(4)[None].at[0, 0, 0].set(60.0).at[0, 1, 1].set(60.0) \
        .at[0, 0, 2].set(48.0).at[0, 1, 2].set(32.0)
    variables = model.init(rng, img, img, K, invert=True, train=False)
    if not train:
        out, _ = model.apply(variables, img, img, K, invert=True,
                             train=False, mutable=False)
        return out, variables

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, img, K, invert=True, train=True,
            mutable=["batch_stats"])[0], None
        total = sum(jnp.mean(v) for k, v in out[0].items()
                    if k.startswith("disp_2_"))
        return total, out[0]

    (val, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    return val, out, grads


def test_sup_all_and_indexing_supervise_more_states():
    cfg = _tiny_cfg(phantom_grad_steps=2, deq_sup_all=True)
    _, out, _ = _run_forward(cfg, train=True)
    ks = [k for k in out if k.startswith("disp_2_") and k != "disp_2_0"]
    assert len(ks) == 2  # both phantom steps supervised

    # deq-lib drops taps at step <= 2 (its loop starts at k=2, firing on
    # k+1) — validated by the gradient oracle — so tap step 3 is the
    # earliest that can fire alongside the appended final state
    cfg = _tiny_cfg(deq_indexing=(3,))
    _, out, _ = _run_forward(cfg, train=True)
    ks = [k for k in out if k.startswith("disp_2_") and k != "disp_2_0"]
    assert len(ks) == 2  # tap at step 3 + the final state

    cfg = _tiny_cfg(deq_indexing=(2,))
    _, out, _ = _run_forward(cfg, train=True)
    ks = [k for k in out if k.startswith("disp_2_") and k != "disp_2_0"]
    assert len(ks) == 1  # the step-2 tap silently drops, as upstream


def test_ift_train_step_finite_grads():
    cfg = _tiny_cfg(deq_ift=True, deq_b_thres=3)
    val, out, grads = _run_forward(cfg, train=True)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    nonzero = sum(float(jnp.abs(g).sum()) for g in flat)
    assert nonzero > 0


def test_robust_pose_loss_changes_pose_path():
    cfg = _tiny_cfg()
    out_plain, _ = _run_forward(cfg, train=False)
    cfg_r = _tiny_cfg(robust_pose_loss=True)
    out_robust, _ = _run_forward(cfg_r, train=False)
    # same weights (same PRNG init), different GN weighting -> different disp
    d = np.abs(np.asarray(out_plain["disp_2_1"])
               - np.asarray(out_robust["disp_2_1"]))
    assert np.isfinite(d).all()
    assert d.max() > 0


def test_disable_flags_family():
    """--disable_pose_updates / --disable_evolving_pose_weight /
    --disable_fixed_pose_weight / --disable_wnorm / --tau
    (`depth_pose.py:450-455`, `update.py:136-141`, `utils.py:291-298`,
    `options.py`): forward runs, and each flag's structural footprint is
    visible in the param tree."""
    cfg = _tiny_cfg(disable_pose_updates=True,
                    disable_evolving_pose_weight=True,
                    disable_fixed_pose_weight=True,
                    disable_wnorm=True,
                    deq_tau=0.5, phantom_grad_steps=2)
    out, variables = _run_forward(cfg, train=False)
    assert np.isfinite(np.asarray(out["disp_2_1"])).all()
    params = variables["params"]
    # fixed pose-weight head unused -> not in the tree
    assert "pose_weights" not in params
    # evolving pose-weight head not built
    ub = params["update_block"]
    assert "weight_conv1" not in ub and "weight" not in ub
    # wnorm off: WNConv has no g param
    leaves = jax.tree_util.tree_leaves_with_path(ub)
    assert not any("'g'" in str(p) for p, _ in leaves)

    # default config DOES build all three
    out2, v2 = _run_forward(_tiny_cfg(), train=False)
    assert "pose_weights" in v2["params"]
    leaves2 = jax.tree_util.tree_leaves_with_path(v2["params"]["update_block"])
    assert any("'g'" in str(p) for p, _ in leaves2)


def test_disable_pose_updates_freezes_pose():
    """With --disable_pose_updates the returned refined pose equals the
    pose-net initial pose (no GN refinement ever runs)."""
    from mal_tpu.dualref.model import DEQDepthPose

    cfg = _tiny_cfg(disable_pose_updates=True)
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, 64, 96, 3))
    img2 = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 96, 3))
    K = jnp.eye(4)[None].at[0, 0, 0].set(60.0).at[0, 1, 1].set(60.0) \
        .at[0, 0, 2].set(48.0).at[0, 1, 2].set(32.0)
    variables = model.init(rng, img1, img2, K, invert=True, train=False)
    _, poses = model.apply(variables, img1, img2, K, invert=True,
                           train=False, mutable=False)
    pose0, pose_star = poses
    np.testing.assert_allclose(np.asarray(pose_star), np.asarray(pose0),
                               rtol=0, atol=0)


def test_num_cost_volume_head_changes_corr_width():
    """--num_cost_volume_head=2 doubles the per-level cost channels feeding
    the update block (`depth_pose.py:435`, `update.py:90`); the forward
    runs and differs from 1-head."""
    out1, _ = _run_forward(_tiny_cfg(), train=False)
    out2, _ = _run_forward(_tiny_cfg(num_cost_volume_head=2), train=False)
    a = np.asarray(out1["disp_2_1"]); b = np.asarray(out2["disp_2_1"])
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 0
