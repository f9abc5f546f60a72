"""Epipolar coordinate generators (DualRefine `Reprojections`,
`dualrefine/networks/utils/utils.py:112-255`).

Generates pixel-coordinate hypothesis sets at the 1/4 feature scale:
- `depth2epipolarcoords`: 2r+1 samples per pyramid level around the current
  depth, spacing controlled by a learnable softplus delta and the gap factor
- `depth2gradcoords`: the projected point ± unit x/y offsets for image
  gradients (Gauss-Newton pose update)
- `depthbins2coords`: a 96-bin sweep for the consistency mask
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Intrinsics(NamedTuple):
    fx: Array
    fy: Array
    cx: Array
    cy: Array

    @classmethod
    def from_K(cls, K: Array) -> "Intrinsics":
        return cls(K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2])


def _iproj(depths: Array, intr: Intrinsics):
    """depths: (B, L, D, h, w) -> homogeneous points (B, 4, L, D, h, w)."""
    B = depths.shape[0]
    h, w = depths.shape[-2:]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=depths.dtype),
                          jnp.arange(w, dtype=depths.dtype), indexing="ij")
    X = (xs[None] - intr.cx[:, None, None]) / intr.fx[:, None, None]
    Y = (ys[None] - intr.cy[:, None, None]) / intr.fy[:, None, None]
    X = X[:, None, None]
    Y = Y[:, None, None]
    ones = jnp.ones_like(depths)
    return jnp.stack([depths * X, depths * Y, depths, ones], axis=1)


def _proj(Xs: Array, intr: Intrinsics):
    """Xs: (B, 4, N) -> pixel coords (B, 2, N) (z-clamped like the ref).

    Z is clamped away from zero sign-preservingly so the backward pass never
    produces inf * 0 = NaN (see `geometry._safe_denom`)."""
    X, Y, Z = Xs[:, 0], Xs[:, 1], Xs[:, 2]
    Z = jnp.where(jnp.abs(Z) < 1e-6, jnp.where(Z < 0, -1e-6, 1e-6), Z)
    d = jnp.clip(1.0 / Z, a_max=100.0)
    x = intr.fx[:, None] * (X * d) + intr.cx[:, None]
    y = intr.fy[:, None] * (Y * d) + intr.cy[:, None]
    return jnp.stack([x, y], axis=1)


class Reprojections(nn.Module):
    corr_radius: int = 8
    num_levels: int = 3
    gap_factor: str = "depth"      # depth | minmax
    gap_factor_depth_ratio: int = 8
    num_depth_bins: int = 96
    min_depth: float = 0.1
    max_depth: float = 100.0
    use_depth_bins_for_masking: bool = False
    pose_updates: bool = True

    def setup(self):
        self.delta = self.param("delta", lambda k: jnp.ones((1,)))
        if self.pose_updates:
            self.delta_p = self.param("delta_p", lambda k: jnp.ones((1,)))

    def depth2epipolarcoords(self, poses: Array, depths: Array, K: Array,
                             min_depth_bin=None, max_depth_bin=None):
        """depths: (B, h, w, 1) -> (coords (B,2,L,2r+1,h,w), max_dx, depth sets)."""
        intr = Intrinsics.from_K(K)
        B, h, w, _ = depths.shape
        r = self.corr_radius
        d0 = jnp.moveaxis(depths, -1, 1)[:, :, None]  # (B, 1, 1, h, w)

        dx = jnp.linspace(-r, r, 2 * r + 1)[None, None, :, None, None]
        if self.gap_factor == "depth":
            gap_factor = d0
        else:  # minmax (`utils.py:174-175`)
            gap_factor = (max_depth_bin - min_depth_bin) * 4 * r / self.num_depth_bins
        dd = jax.nn.softplus(self.delta)
        gap = dd * gap_factor / self.gap_factor_depth_ratio / r

        deltas = []
        max_dx = None
        for level in range(self.num_levels):
            delta = (2 ** level) * jnp.ones_like(d0) * gap
            if level == 0:
                max_dx = jnp.max(dx * delta, axis=2)  # (B, 1, h, w)
            deltas.append(dx * delta)
        deltas = jnp.concatenate(deltas, axis=2)  # (B,1,L*(2r+1),h,w)

        ds = d0 + deltas  # (B, 1, L*(2r+1), h, w)
        X0 = _iproj(ds, intr)  # (B, 4, 1, L*(2r+1), h, w)
        X1 = jnp.einsum("bij,bjn->bin", poses, X0.reshape(B, 4, -1), precision="highest")
        c1 = _proj(X1, intr).reshape(B, 2, self.num_levels, 2 * r + 1, h, w)
        # max_dx: (B, 1, h, w) -> NHWC (B, h, w, 1)
        return c1, jnp.moveaxis(max_dx, 1, -1), ds

    def depth2gradcoords(self, poses: Array, depths: Array, K: Array):
        """Projected point ± unit x/y shifts: (B, 2, 1, 5, h, w) and P2 (B,3,hw)."""
        intr = Intrinsics.from_K(K)
        B, h, w, _ = depths.shape
        d0 = jnp.moveaxis(depths, -1, 1)[:, :, None]  # (B,1,1,h,w)
        X0 = _iproj(d0, intr)
        X1 = jnp.einsum("bij,bjn->bin", poses, X0.reshape(B, 4, -1), precision="highest")
        c1 = _proj(X1, intr).reshape(B, 2, 1, 1, h, w)

        p_dx = jnp.asarray([1.0, 0.0]).reshape(1, 2, 1, 1, 1, 1)
        p_dy = jnp.asarray([0.0, 1.0]).reshape(1, 2, 1, 1, 1, 1)
        p_delta = jnp.concatenate([p_dx, -p_dx, p_dy, -p_dy], axis=3)
        c1 = jnp.concatenate([c1, c1 + p_delta], axis=3)  # (B,2,1,5,h,w)
        return c1, X1[:, :3]

    def depthbins2coords(self, poses: Array, depths: Array, K: Array,
                         min_depth_bin=None, max_depth_bin=None):
        """96-bin sweep coords for the consistency mask (`utils.py:232-255`)."""
        intr = Intrinsics.from_K(K)
        B, h, w, _ = depths.shape
        D = self.num_depth_bins
        d0 = jnp.moveaxis(depths, -1, 1)  # (B, 1, h, w)

        if self.use_depth_bins_for_masking:
            bins = jnp.linspace(min_depth_bin, max_depth_bin, D)
            ds = jnp.broadcast_to(bins[None, None, :, None, None],
                                  (B, 1, D, h, w))
        else:
            lin = jnp.linspace(0.0, 1.0, D)
            depths_ = 8.0 * (d0 - self.min_depth) + self.min_depth
            depths_ = jnp.clip(depths_, a_max=self.max_depth)
            lin_ = (depths_ - self.min_depth) / (d0 - self.min_depth)
            lin_full = lin[None, None, :, None, None] * lin_[:, None]
            ds = lin_full * (d0[:, None] - self.min_depth) + self.min_depth

        X0 = _iproj(ds, intr)
        X1 = jnp.einsum("bij,bjn->bin", poses, X0.reshape(B, 4, -1), precision="highest")
        c1 = _proj(X1, intr).reshape(B, 2, 1, D, h, w)
        return c1, ds
