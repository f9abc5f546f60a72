"""DualRefine numerics vs torch twins of the reference equations.

Covers the three pieces that decide `dual_k` eval parity and were previously
only exercised indirectly: the epipolar hypothesis generator
(`dualrefine/networks/utils/utils.py:160-231` Reprojections), the epipolar
cost sampler (`dualrefine/networks/corr.py:24-77` CoordSampler), and the
feature-metric Gauss-Newton pose update (`utils/utils.py:303-413`
PoseUpdate.direct_align incl. se3_exp from `dualrefine/layers.py:29-56`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mal_tpu import geometry
from mal_tpu.dualref.corr import build_pyramid, epipolar_cost
from mal_tpu.dualref.pose_update import direct_align
from mal_tpu.dualref.reprojections import Reprojections

B, H, W, C = 2, 8, 12, 8
R_RADIUS = 3
LEVELS = 2


def _intr():
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 10.0, 11.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    return np.broadcast_to(K, (B, 4, 4)).copy()


def _poses(rng):
    aa = jnp.asarray(rng.normal(0, 0.02, (B, 3)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 0.05, (B, 3)).astype(np.float32))
    return np.asarray(geometry.transformation_from_parameters(aa, t))


# --- torch twins ------------------------------------------------------------
def t_iproj(depths, K):
    """depths: (B, 1, D, h, w) -> (B, 4, D, h, w) homog points."""
    b, _, D, h, w = depths.shape
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    y, x = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(),
                          indexing="ij")
    X = (x[None] - cx[:, None, None]) / fx[:, None, None]
    Y = (y[None] - cy[:, None, None]) / fy[:, None, None]
    X, Y = X[:, None, None], Y[:, None, None]
    Z = depths[:, 0][:, None]
    return torch.cat([Z * X, Z * Y, Z, torch.ones_like(Z)], dim=1)


def t_proj(Xs, K):
    X, Y, Z, _ = Xs.unbind(dim=1)
    d = torch.clamp(1.0 / Z, max=100)
    x = K[:, 0, 0][:, None] * (X * d) + K[:, 0, 2][:, None]
    y = K[:, 1, 1][:, None] * (Y * d) + K[:, 1, 2][:, None]
    return torch.stack([x, y], dim=1)


def t_epipolarcoords(poses, depths, K, delta, radius, levels, ratio=8):
    """`Reprojections.depth2epipolarcoords` twin (gap_factor='depth')."""
    b, _, h, w = depths.shape
    r = radius
    dx = torch.linspace(-r, r, 2 * r + 1)[None, None, :, None, None]
    d0 = depths[:, None]
    gap = F.softplus(delta) * d0 / ratio / r
    deltas, max_dx = [], None
    for level in range(levels):
        dlt = (2 ** level) * torch.ones_like(d0) * gap
        if level == 0:
            max_dx = (dx * dlt).max(dim=2, keepdim=True)[0][:, 0]
        deltas.append(dx * dlt)
    ds = d0 + torch.cat(deltas, 2)
    X0 = t_iproj(ds, K)
    X1 = poses @ X0.reshape(b, 4, -1)
    c1 = t_proj(X1, K).reshape(b, 2, levels, 2 * r + 1, h, w)
    return c1, max_dx, ds


def t_epipolar_cost(fmap1, pyramid, coords, num_levels, num_head=1):
    """`CoordSampler.__call__` twin (NCHW in/out)."""
    batch, _, n1, d1, h1, w1 = coords.shape
    coords = coords.permute(2, 0, 4, 5, 3, 1).reshape(
        num_levels, batch, h1 * w1, d1, 2)
    f1 = fmap1[..., None]
    out = []
    for i in range(num_levels):
        xg, yg = coords[i].split([1, 1], dim=-1)
        grid = torch.cat([2 * (xg + 0.5) / w1 - 1, 2 * (yg + 0.5) / h1 - 1],
                         dim=-1)
        f2 = F.grid_sample(pyramid[i], grid, align_corners=False)
        f2 = f2.view(batch, -1, h1, w1, d1)
        corr = torch.abs(f1 - f2)
        corr = corr.view(batch, num_head, -1, h1, w1, d1).mean(2)
        corr = corr.permute(0, 2, 3, 1, 4).reshape(batch, h1, w1, -1)
        out.append(corr)
    return torch.cat(out, dim=-1)


def t_se3_exp(xi):
    """SE(3) exponential (`dualrefine/layers.py:29-56` convention:
    xi = [t, w])."""
    t_, w_ = xi[:, :3], xi[:, 3:]
    theta = torch.norm(w_, dim=1, keepdim=True).clamp(min=1e-8)
    k = w_ / theta
    Kx = torch.zeros(xi.shape[0], 3, 3)
    Kx[:, 0, 1], Kx[:, 0, 2] = -k[:, 2], k[:, 1]
    Kx[:, 1, 0], Kx[:, 1, 2] = k[:, 2], -k[:, 0]
    Kx[:, 2, 0], Kx[:, 2, 1] = -k[:, 1], k[:, 0]
    th = theta[..., None]
    I = torch.eye(3)[None]
    # with the UNIT axis in Kx (`dualrefine/layers.py:43-49`):
    # R = cos I + (1-cos) aa^T + sin K;  J = (sin/th) I + (1-sin/th) aa^T
    #   + ((1-cos)/th) K — rewritten via aa^T = I + K^2
    R = I + torch.sin(th) * Kx + (1 - torch.cos(th)) * (Kx @ Kx)
    V = I + ((1 - torch.cos(th)) / th) * Kx \
        + (1 - torch.sin(th) / th) * (Kx @ Kx)
    out = torch.eye(4)[None].repeat(xi.shape[0], 1, 1)
    out[:, :3, :3] = R
    out[:, :3, 3] = (V @ t_[..., None])[..., 0]
    return out


def t_direct_align(poses, K, p2, P2, src_feat, tgt_feat, src_w, tgt_w,
                   weight):
    """`PoseUpdate.direct_align` twin (NCHW feats, (B,2,1,5,h,w) coords)."""
    bsz, channels, h, w = src_feat.shape
    p2p = p2.permute(2, 0, 4, 5, 3, 1).reshape(bsz, h * w, 5, 2)
    xg, yg = p2p.split([1, 1], dim=-1)
    grid = torch.cat([2 * (xg + 0.5) / w - 1, 2 * (yg + 0.5) / h - 1], dim=-1)
    f = F.grid_sample(tgt_feat, grid, align_corners=False).view(
        bsz, -1, h, w, 5)
    warped = f[..., 0]
    grads = torch.stack([(f[..., 1] - f[..., 2]) / 2,
                         (f[..., 3] - f[..., 4]) / 2], dim=-1)
    w_t = F.grid_sample(tgt_w, grid[:, :, :1], align_corners=False).reshape(
        bsz, 1, h, w)

    X, Y, Z = P2[:, 0], P2[:, 1], P2[:, 2]
    fx, fy = K[:, 0, 0].reshape(-1, 1), K[:, 1, 1].reshape(-1, 1)
    fxZ, fyZ = fx / Z, fy / Z
    fxXZ2, fyYZ2 = fxZ * X / Z, fyZ * Y / Z
    zeros = torch.zeros_like(fxXZ2)
    Jp = torch.stack((
        torch.stack((fxZ, zeros, -fxXZ2, -fxXZ2 * Y, fx + fxXZ2 * X,
                     -fxZ * Y), 1),
        torch.stack((zeros, fyZ, -fyYZ2, -fy - fyYZ2 * Y, fyYZ2 * X,
                     fyZ * X), 1)), 1).permute(0, 3, 1, 2)
    Ji = grads.reshape(bsz, channels, h * w, 2).permute(0, 2, 1, 3)
    J = -Ji @ Jp
    res = (src_feat - warped).permute(0, 2, 3, 1).reshape(-1, h * w, channels, 1)
    wmap = src_w * w_t
    if weight is not None:
        wmap = wmap * weight
    JW = J * wmap.reshape(bsz, h * w, 1, 1)
    Hm = (JW.transpose(2, 3) @ J).sum(1)
    b = (-res * JW).sum(2).sum(1)
    L = torch.linalg.cholesky(Hm)
    update = torch.cholesky_solve(b[..., None], L)
    new_poses = t_se3_exp(update[..., 0]) @ poses
    return new_poses, update[..., 0]


# --- tests ------------------------------------------------------------------
def test_epipolar_coords_parity():
    rng = np.random.RandomState(0)
    depths = rng.uniform(2, 20, (B, H, W, 1)).astype(np.float32)
    poses = _poses(rng)
    K = _intr()
    delta_v = 0.7

    mod = Reprojections(corr_radius=R_RADIUS, num_levels=LEVELS,
                        gap_factor="depth")
    (c1, max_dx, ds), _ = mod.apply(
        {"params": {"delta": jnp.full((1,), delta_v),
                    "delta_p": jnp.ones((1,))}},
        jnp.asarray(poses), jnp.asarray(depths), jnp.asarray(K),
        method=Reprojections.depth2epipolarcoords, mutable=[])

    tc1, tmax, tds = t_epipolarcoords(
        torch.from_numpy(poses),
        torch.from_numpy(depths).permute(0, 3, 1, 2),
        torch.from_numpy(K), torch.tensor([delta_v]), R_RADIUS, LEVELS)

    np.testing.assert_allclose(np.asarray(c1), tc1.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(max_dx)[..., 0],
                               tmax[:, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ds)[:, 0], tds[:, 0].numpy(),
                               atol=1e-5)


def test_epipolar_cost_parity():
    rng = np.random.RandomState(1)
    fmap1 = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    fmap2 = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    D = 2 * R_RADIUS + 1
    coords = rng.uniform(-1, max(H, W), (B, 2, LEVELS, D, H, W)).astype(np.float32)

    pyr = build_pyramid(jnp.asarray(fmap2), LEVELS)
    for heads in (1, 2):
        ours = epipolar_cost(jnp.asarray(fmap1), pyr, jnp.asarray(coords),
                             LEVELS, num_head=heads)

        tf1 = torch.from_numpy(fmap1).permute(0, 3, 1, 2)
        tf2 = torch.from_numpy(fmap2).permute(0, 3, 1, 2)
        tpyr = [tf2]
        for _ in range(LEVELS - 1):
            tpyr.append(F.avg_pool2d(tpyr[-1], 2, stride=2))
        ref = t_epipolar_cost(tf1, tpyr, torch.from_numpy(coords), LEVELS,
                              num_head=heads)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_se3_exp_parity():
    rng = np.random.RandomState(2)
    xi = rng.normal(0, 0.3, (B, 6)).astype(np.float32)
    ours = np.asarray(geometry.se3_exp(jnp.asarray(xi)))
    ref = t_se3_exp(torch.from_numpy(xi)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_direct_align_parity():
    rng = np.random.RandomState(3)
    K = _intr()
    poses = _poses(rng)
    depths = rng.uniform(3, 15, (B, H, W, 1)).astype(np.float32)
    src = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    tgt = src + rng.normal(0, 0.1, (B, H, W, C)).astype(np.float32)
    src_w = rng.uniform(0.3, 1.0, (B, H, W, 1)).astype(np.float32)
    tgt_w = rng.uniform(0.3, 1.0, (B, H, W, 1)).astype(np.float32)
    weight = rng.uniform(0.3, 1.0, (B, H, W, 1)).astype(np.float32)

    mod = Reprojections(corr_radius=R_RADIUS, num_levels=LEVELS)
    (p2, P2), _ = mod.apply(
        {"params": {"delta": jnp.ones((1,)), "delta_p": jnp.ones((1,))}},
        jnp.asarray(poses), jnp.asarray(depths), jnp.asarray(K),
        method=Reprojections.depth2gradcoords, mutable=[])

    new_poses, update = direct_align(
        jnp.asarray(poses), jnp.asarray(K), p2, P2,
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(src_w), jnp.asarray(tgt_w), jnp.asarray(weight))

    def tt(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    tref, tupd = t_direct_align(
        torch.from_numpy(poses), torch.from_numpy(K),
        torch.from_numpy(np.asarray(p2)),
        torch.from_numpy(np.asarray(P2)),
        tt(src), tt(tgt), tt(src_w), tt(tgt_w), tt(weight))

    np.testing.assert_allclose(np.asarray(update), tupd.numpy(),
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_poses), tref.numpy(), atol=1e-4)
