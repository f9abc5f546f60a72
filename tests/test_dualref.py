"""DualRefine stack tests: solvers, epipolar sampler, GN pose update, HRNet,
and the composed DEQ model (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.dualref.corr import avg_pool2, build_pyramid, epipolar_cost
from mal_tpu.dualref.hr_decoder import HRDepthDecoder
from mal_tpu.dualref.hrnet import HRNet
from mal_tpu.dualref.model import DEQDepthPose
from mal_tpu.dualref.solvers import (anderson_solver, broyden_solver,
                                     fixed_point_iter, phantom_grad)


# ---------------------------------------------------------------- solvers
def _affine_problem(n=16, seed=0):
    """f(z) = Az + b with spectral radius < 1 -> unique fixed point."""
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n).astype(np.float32)
    A = 0.6 * A / np.abs(np.linalg.eigvals(A)).max()
    b = rng.randn(n).astype(np.float32)
    z_true = np.linalg.solve(np.eye(n) - A, b)
    f = lambda z: z @ jnp.asarray(A.T) + jnp.asarray(b)
    z0 = jnp.zeros((3, n))
    return f, z0, np.broadcast_to(z_true, (3, n))


def test_fixed_point_iter_converges():
    f, z0, z_true = _affine_problem()
    res = fixed_point_iter(f, z0, steps=60)
    np.testing.assert_allclose(np.asarray(res.result), z_true, atol=1e-3)
    assert float(res.abs_trace[-1]) < float(res.abs_trace[0])


def test_anderson_converges_faster_than_picard():
    f, z0, z_true = _affine_problem(seed=1)
    picard = fixed_point_iter(f, z0, steps=12)
    anderson = anderson_solver(f, z0, steps=12)
    err_p = np.abs(np.asarray(picard.result) - z_true).max()
    err_a = np.abs(np.asarray(anderson.result) - z_true).max()
    np.testing.assert_allclose(np.asarray(anderson.result), z_true, atol=1e-2)
    assert err_a < err_p


def test_broyden_converges():
    f, z0, z_true = _affine_problem(seed=2)
    res = broyden_solver(f, z0, steps=30)
    np.testing.assert_allclose(np.asarray(res.result), z_true, atol=1e-2)


def test_phantom_grad_matches_implicit_gradient():
    """For a contraction, many phantom steps approximate the implicit grad."""
    n = 6
    rng = np.random.RandomState(3)
    A = rng.randn(n, n).astype(np.float32)
    A = 0.3 * A / np.abs(np.linalg.eigvals(A)).max()
    A = jnp.asarray(A)

    def loss(b):
        f = lambda z: z @ A.T + b
        res = fixed_point_iter(f, jnp.zeros((1, n)), steps=80)
        z = phantom_grad(f, res.result, steps=40)
        return jnp.sum(z ** 2)

    b = jnp.asarray(rng.randn(1, n).astype(np.float32))
    g = jax.grad(loss)(b)

    # analytic: z* = (I-A)^-1 b; dL/db = 2 (I-A)^-T z*
    I = jnp.eye(n)
    z_star = jnp.linalg.solve(I - A, b[0])
    g_true = 2.0 * jnp.linalg.solve((I - A).T, z_star)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g_true), rtol=2e-3,
                               atol=1e-4)


# ---------------------------------------------------------------- corr
def test_epipolar_cost_zero_at_identity():
    """Sampling fmap2=fmap1 at identity coords -> zero cost at level 0."""
    rng = np.random.RandomState(0)
    B, h, w, C = 1, 8, 12, 4
    fmap = jnp.asarray(rng.uniform(0, 1, (B, h, w, C)).astype(np.float32))
    pyr = build_pyramid(fmap, 2)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([xs, ys], 0).astype(np.float32)  # (2, h, w)
    coords = np.broadcast_to(coords[None, :, None, None], (B, 2, 2, 1, h, w)).copy()

    cost = epipolar_cost(fmap, pyr, jnp.asarray(coords), num_levels=2)
    assert cost.shape == (B, h, w, 2)
    # level 0 at the exact grid -> zero difference (interior pixels)
    np.testing.assert_allclose(np.asarray(cost[0, 2:-2, 2:-2, 0]), 0.0, atol=1e-5)


def test_avg_pool2():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = np.asarray(avg_pool2(x))
    np.testing.assert_allclose(out[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)


# ---------------------------------------------------------------- hrnet
def test_hrnet_tap_shapes():
    model = HRNet(base_width=18)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    taps = model.apply(vars_, x)
    assert taps["stem1"].shape == (1, 32, 48, 64)
    assert taps["stem2"].shape == (1, 16, 24, 64)
    assert [t.shape for t in taps["list18"]] == [(1, 16, 24, 64)] + [(1, 16, 24, 18)] * 3
    assert [t.shape for t in taps["list36"]] == [(1, 8, 12, 36)] * 3
    assert [t.shape for t in taps["list72"]] == [(1, 4, 6, 72)] * 2
    assert taps["x144"].shape == (1, 2, 3, 144)


def test_hr_decoder_shapes():
    model = HRNet(base_width=18)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    taps = model.apply(vars_, x)

    dec = HRDepthDecoder()
    dvars = dec.init(jax.random.PRNGKey(1), taps)
    disps, inter = dec.apply(dvars, taps)
    assert disps[0].shape == (1, 64, 96, 1)
    assert disps[1].shape == (1, 32, 48, 1)
    assert disps[2].shape == (1, 16, 24, 1)
    assert disps[3].shape == (1, 8, 12, 1)
    assert inter["relu_x18"].shape == (1, 16, 24, 64)


# ---------------------------------------------------------------- model
CFG = Config(height=64, width=96, deq_iters=2, corr_radius=2, corr_levels=2,
             num_pose_iter=1, method="dualrefine")


@pytest.mark.slow
def test_deq_depth_pose_forward():
    cfg = CFG
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.RandomState(0)
    img1 = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    img2 = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * 96, 1.92 * 64, 0.5 * 96, 0.5 * 64
    K = jnp.asarray(K[None])

    vars_ = model.init(rng, img1, img2, K, train=False)
    outputs, poses = model.apply(vars_, img1, img2, K, train=False,
                                 mutable=False)
    assert outputs["disp_0_0"].shape == (1, 64, 96, 1)
    assert outputs["disp_2_1"].shape == (1, 16, 24, 1)
    assert outputs["disp_0_1"].shape == (1, 64, 96, 1)
    assert poses[0].shape == (1, 4, 4) and poses[1].shape == (1, 4, 4)
    for k, v in outputs.items():
        assert bool(jnp.isfinite(v).all()), k
    # refined pose stays near the initial one at init (tiny updates)
    np.testing.assert_allclose(np.asarray(poses[1]), np.asarray(poses[0]),
                               atol=0.5)


@pytest.mark.slow
def test_per_sample_sides_selects_matching_pose_net():
    """`sides` (B,) selects each sample's pose net; a sides vector of all-s
    must reproduce the static side=s path exactly."""
    cfg = CFG
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (2, cfg.height, cfg.width, 3))
    img2 = jax.random.uniform(jax.random.PRNGKey(1), img1.shape)
    K = jnp.broadcast_to(jnp.eye(4).at[0, 0].set(50.).at[1, 1].set(50.)
                         .at[0, 2].set(cfg.width / 2)
                         .at[1, 2].set(cfg.height / 2), (2, 4, 4))
    variables = model.init(rng, img1, img2, K, invert=True, train=False)

    out_static, poses_static = model.apply(
        variables, img1, img2, K, invert=True, side=1, train=False,
        mutable=False)
    out_sides, poses_sides = model.apply(
        variables, img1, img2, K, invert=True, sides=jnp.ones((2,), jnp.int32),
        train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(poses_static[0]),
                               np.asarray(poses_sides[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_static["disp_0_1"]),
                               np.asarray(out_sides["disp_0_1"]), atol=1e-5)

    # mixed sides differ from any single static side (different nets)
    _, poses_mixed = model.apply(
        variables, img1, img2, K, invert=True,
        sides=jnp.asarray([0, 2], jnp.int32), train=False, mutable=False)
    assert not np.allclose(np.asarray(poses_mixed[0]),
                           np.asarray(poses_static[0]))


@pytest.mark.slow
def test_bf16_fast_mode_param_tree_and_forward():
    """TPU fast mode (bf16 HRNet/pose trunks, round 5): the parameter tree
    must be IDENTICAL to fp32 (checkpoints interchangeable — dtype only
    changes compute), the forward must stay finite, and the DEQ-side
    outputs must stay fp32 (the solve runs full precision)."""
    cfg = CFG.replace(compute_dtype="bfloat16")
    model = DEQDepthPose(cfg)
    model32 = DEQDepthPose(CFG)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.RandomState(0)
    img1 = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    img2 = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * 96, 1.92 * 64, 48.0, 32.0
    K = jnp.asarray(K[None])

    s16 = jax.eval_shape(lambda: model.init(rng, img1, img2, K, train=False))
    s32 = jax.eval_shape(lambda: model32.init(rng, img1, img2, K, train=False))
    p16 = jax.tree.map(lambda a: (a.shape, a.dtype), s16)
    p32 = jax.tree.map(lambda a: (a.shape, a.dtype), s32)
    assert jax.tree_util.tree_structure(p16) == \
        jax.tree_util.tree_structure(p32)
    assert jax.tree.leaves(p16) == jax.tree.leaves(p32)

    vars_ = model.init(rng, img1, img2, K, train=False)
    outputs, poses = model.apply(vars_, img1, img2, K, train=False,
                                 mutable=False)
    for k, v in outputs.items():
        if jnp.issubdtype(v.dtype, jnp.floating):
            assert v.dtype == jnp.float32, (k, v.dtype)
            assert bool(jnp.isfinite(v).all()), k
    assert bool(jnp.isfinite(poses[1]).all())
