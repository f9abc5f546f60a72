"""Plane-sweep cost volume vs a naive per-item torch oracle.

The oracle follows the reference semantics of
`manydepth/networks/resnet_encoder.py:151-233` (loop over batch/frames/planes,
torch grid_sample zeros/align_corners=True, border-2 edge masks, L1-mean,
count-average, missing->max fill) implemented independently.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mal_tpu.ops.cost_volume import (
    compute_depth_bins,
    confidence_mask_from_cost,
    indices_to_disparity,
    plane_sweep_cost_volume,
)


def _camera(B, h, w):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
    K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
    K = np.broadcast_to(K, (B, 4, 4)).copy()
    return K, np.linalg.inv(K)


def oracle_cost_volume(cur, lookup, poses, K, invK, bins):
    """cur: (B,h,w,C); lookup: (B,F,h,w,C); poses: (B,F,4,4); bins: (D,)."""
    B, h, w, C = cur.shape
    Fn = lookup.shape[1]
    D = len(bins)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs.ravel(), ys.ravel(), np.ones(h * w)], 0).astype(np.float32)

    out_cost = np.zeros((B, D, h, w), np.float32)
    out_missing = np.zeros((B, D, h, w), np.float32)
    for b in range(B):
        cost = np.zeros((D, h, w), np.float32)
        counts = np.zeros((D, h, w), np.float32)
        rays = invK[b, :3, :3] @ pix
        for f in range(Fn):
            T = poses[b, f]
            if np.abs(T).sum() == 0:
                continue
            P = (K[b] @ T)[:3]
            for d_idx, d in enumerate(bins):
                pts = np.concatenate([d * rays, np.ones((1, h * w), np.float32)], 0)
                cam = P @ pts
                xy = cam[:2] / (cam[2:3] + 1e-7)
                gx = (xy[0].reshape(h, w) / (w - 1) - 0.5) * 2
                gy = (xy[1].reshape(h, w) / (h - 1) - 0.5) * 2
                grid = torch.from_numpy(np.stack([gx, gy], -1)[None].astype(np.float32))
                src = torch.from_numpy(lookup[b, f][None]).permute(0, 3, 1, 2)
                warped = F.grid_sample(src, grid, mode="bilinear",
                                       padding_mode="zeros", align_corners=True)
                warped = warped[0].permute(1, 2, 0).numpy()

                x_v = (gx / 2 + 0.5) * (w - 1)
                y_v = (gy / 2 + 0.5) * (h - 1)
                edge = ((x_v >= 2) & (x_v <= w - 2) & (y_v >= 2) & (y_v <= h - 2)).astype(np.float32)
                cur_mask = np.zeros((h, w), np.float32)
                cur_mask[2:-2, 2:-2] = 1
                edge = edge * cur_mask

                diff = np.abs(warped - cur[b]).mean(-1) * edge
                cost[d_idx] += diff
                counts[d_idx] += (diff > 0).astype(np.float32)
        cost = cost / (counts + 1e-7)
        missing = (cost == 0).astype(np.float32)
        cost = cost * (1 - missing) + cost.max(0, keepdims=True) * missing
        out_cost[b], out_missing[b] = cost, missing
    return out_cost, out_missing


def test_cost_volume_matches_oracle():
    rng = np.random.RandomState(0)
    B, Fn, h, w, C, D = 2, 2, 12, 20, 8, 8
    cur = rng.uniform(0, 1, (B, h, w, C)).astype(np.float32)
    lookup = rng.uniform(0, 1, (B, Fn, h, w, C)).astype(np.float32)
    K, invK = _camera(B, h, w)

    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (B, Fn, 4, 4)).copy()
    poses[:, :, 0, 3] = rng.uniform(-0.3, 0.3, (B, Fn))  # small x translations
    poses[:, :, 2, 3] = rng.uniform(-0.2, 0.2, (B, Fn))
    poses[1, 1] = 0.0  # a missing frame

    bins = np.asarray(compute_depth_bins(0.5, 10.0, D, "linear"))
    cost, missing = plane_sweep_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), jnp.asarray(bins), chunk=4)

    ref_cost, ref_missing = oracle_cost_volume(cur, lookup, poses, K, invK, bins)
    np.testing.assert_allclose(np.asarray(cost), ref_cost, atol=2e-5)
    np.testing.assert_allclose(np.asarray(missing), ref_missing, atol=1e-6)


def test_depth_bins_modes():
    lin = np.asarray(compute_depth_bins(1.0, 10.0, 10, "linear"))
    np.testing.assert_allclose(lin, np.linspace(1, 10, 10), rtol=1e-6)

    inv = np.asarray(compute_depth_bins(1.0, 10.0, 10, "inverse"))
    assert np.all(np.diff(inv) > 0)
    np.testing.assert_allclose(inv[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(inv[-1], 10.0, rtol=1e-5)
    # linear in inverse depth
    np.testing.assert_allclose(np.diff(1.0 / inv[::-1]), np.diff(1.0 / inv[::-1])[0], rtol=1e-4)

    log = np.asarray(compute_depth_bins(1.0, 10.0, 10, "log"))
    np.testing.assert_allclose(log[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.diff(np.log(log)), np.diff(np.log(log))[0], rtol=1e-4)


def test_confidence_and_argmin_disp():
    rng = np.random.RandomState(1)
    B, D, h, w = 1, 6, 8, 8
    cost = rng.uniform(0.1, 1.0, (B, D, h, w)).astype(np.float32)
    missing = np.zeros_like(cost)
    missing[0, :, 0, 0] = 1  # a pixel missing in every bin
    conf = np.asarray(confidence_mask_from_cost(jnp.asarray(cost * (1 - missing) + missing * 0),
                                                jnp.asarray(missing)))
    assert conf[0, 0, 0] == 0
    assert conf[0, 4, 4] == 1

    bins = np.linspace(1, 6, D).astype(np.float32)
    disp = np.asarray(indices_to_disparity(jnp.asarray(cost), jnp.asarray(bins)))
    am = cost.argmin(1)
    np.testing.assert_allclose(disp, 1.0 / bins[am], rtol=1e-6)
