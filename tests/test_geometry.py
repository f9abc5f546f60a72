"""Golden-value tests for the geometry kernels.

Parity oracle is torch (the reference is plain torch math); tolerances are
fp32-tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mal_tpu import geometry


def test_disp_to_depth_roundtrip():
    disp = jnp.linspace(0.01, 0.99, 17)
    scaled, depth = geometry.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(scaled), 1.0 / np.asarray(depth), rtol=1e-6)
    # endpoints: disp=1 -> min_depth, disp=0 -> max_depth
    _, d0 = geometry.disp_to_depth(jnp.zeros(()), 0.1, 100.0)
    _, d1 = geometry.disp_to_depth(jnp.ones(()), 0.1, 100.0)
    assert np.isclose(float(d0), 100.0) and np.isclose(float(d1), 0.1)
    back = geometry.depth_to_disp(depth, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(disp), rtol=1e-5)


def test_rot_from_axisangle_matches_rodrigues():
    rng = np.random.RandomState(0)
    vec = rng.randn(8, 3).astype(np.float32) * 0.3
    R = np.asarray(geometry.rot_from_axisangle(jnp.asarray(vec)))
    # independent Rodrigues oracle
    for i in range(8):
        v = vec[i]
        theta = np.linalg.norm(v)
        k = v / (theta + 1e-7)
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R_ref = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(R[i, :3, :3], R_ref, atol=1e-5)
        np.testing.assert_allclose(R[i, 3, 3], 1.0)


def test_transformation_inverse_composes_to_identity():
    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(4, 3).astype(np.float32) * 0.1)
    t = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    A = geometry.transformation_from_parameters(aa, t, invert=True)
    B = geometry.transformation_from_parameters(aa, t, invert=False)
    prod = np.asarray(A @ B)
    for i in range(4):
        np.testing.assert_allclose(prod[i], np.eye(4), atol=1e-5)


def test_backproject_project_roundtrip():
    """Projecting backprojected points with identity pose returns the grid."""
    B, H, W = 2, 12, 20
    rng = np.random.RandomState(2)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 0.58 * W, 1.92 * H, 0.5 * W, 0.5 * H
    K = np.broadcast_to(K, (B, 4, 4)).copy()
    inv_K = np.linalg.inv(K)
    depth = jnp.asarray(rng.uniform(1, 10, (B, H, W)).astype(np.float32))

    pts = geometry.backproject(depth, jnp.asarray(inv_K), H, W)
    assert pts.shape == (B, 4, H * W)
    grid = geometry.project_3d(pts, jnp.asarray(K), jnp.eye(4)[None].repeat(B, 0), H, W)
    # expected: the identity warp in normalized coords
    xs = (np.arange(W) / (W - 1) - 0.5) * 2
    ys = (np.arange(H) / (H - 1) - 0.5) * 2
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    np.testing.assert_allclose(np.asarray(grid[..., 0]), np.broadcast_to(gx, (B, H, W)), atol=2e-4)
    np.testing.assert_allclose(np.asarray(grid[..., 1]), np.broadcast_to(gy, (B, H, W)), atol=2e-4)


def test_se3_exp_identity_and_pure_translation():
    T0 = np.asarray(geometry.se3_exp(jnp.zeros((1, 6))))
    np.testing.assert_allclose(T0[0], np.eye(4), atol=1e-6)
    xi = jnp.asarray(np.array([[1.0, 2.0, 3.0, 0, 0, 0]], np.float32))
    T = np.asarray(geometry.se3_exp(xi))
    np.testing.assert_allclose(T[0, :3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[0, :3, :3], np.eye(3), atol=1e-6)


def test_se3_exp_matches_matrix_exponential():
    from scipy.linalg import expm
    rng = np.random.RandomState(3)
    xi = rng.randn(5, 6).astype(np.float32) * 0.4
    T = np.asarray(geometry.se3_exp(jnp.asarray(xi)))
    for i in range(5):
        v, w = xi[i, :3], xi[i, 3:]
        m = np.zeros((4, 4))
        m[:3, :3] = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        m[:3, 3] = v
        np.testing.assert_allclose(T[i], expm(m), atol=1e-4)


def test_scale_intrinsics():
    K = jnp.asarray(np.diag([640.0, 192.0, 1.0, 1.0])[None].astype(np.float32))
    K = K.at[:, 0, 2].set(320.0)
    K2 = geometry.scale_intrinsics(K, 2)
    assert float(K2[0, 0, 0]) == 160.0
    assert float(K2[0, 0, 2]) == 80.0
    assert float(K2[0, 2, 2]) == 1.0


def test_project_3d_gradient_finite_at_zero_z():
    """Regression: points crossing the camera plane (z ~ -1e-7) must not
    produce NaN gradients through masked warps (inf * 0 in the div backward)."""
    B, H, W = 1, 4, 6
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 10.0, 10.0, 3.0, 2.0
    K = jnp.asarray(K[None])
    T = jnp.eye(4)[None]

    def loss(depth_scale):
        # z values straddling zero, including one at exactly -1e-7
        z = jnp.asarray([-1e-7, -1e-3, 1e-8, 0.5, 1.0, 2.0] * 4,
                        jnp.float32).reshape(1, H, W) * depth_scale
        pts = jnp.stack([jnp.ones_like(z.reshape(1, -1)),
                         jnp.ones_like(z.reshape(1, -1)),
                         z.reshape(1, -1),
                         jnp.ones_like(z.reshape(1, -1))], axis=1)
        grid = geometry.project_3d(pts, K, T, H, W)
        # masked consumption (out-of-range coords clipped away)
        return jnp.sum(jnp.clip(grid, -1.0, 1.0))

    g = jax.grad(loss)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
