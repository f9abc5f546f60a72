"""Feature-metric Gauss-Newton pose update (DualRefine `PoseUpdate`,
`dualrefine/networks/utils/utils.py:258-413`).

Learned per-pixel uncertainty weights (1/(1+w)), the 6-DoF pixel Jacobian,
image-gradient chain rule from ±1-pixel samples, weighted normal equations
H = JᵀWJ, a Cholesky solve with a `where`-guarded generic-solve fallback (the
reference catches Cholesky failure with try/except — jit requires branchless
guards), and an SE(3)-exponential pose composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mal_tpu import geometry
from mal_tpu.ops.interp import grid_sample

Array = jax.Array

# The uncertainty head lives in `mal_tpu.dualref.model._PoseWeights`
# (batch-norm residual blocks matching the `pose_update.weights` checkpoint
# layout); this module holds the functional Gauss-Newton math only.


def compute_uncertainty(weights_out_src: Array, weights_out_tgt: Array):
    """w -> 1/(1+w) (`utils.py:291-298`)."""
    return 1.0 / (1.0 + weights_out_src), 1.0 / (1.0 + weights_out_tgt)


def sample_tgt(tgt_feat: Array, tgt_w: Array, p2: Array):
    """Sample target features at projected coords + ±1-px gradient samples.

    tgt_feat: (B, h, w, C); tgt_w: (B, h, w, 1); p2: (B, 2, 1, 5, h, w).
    Returns (warped_feat (B,h,w,C), grads (B,h,w,C,2), warped_w (B,h,w,1)).
    """
    B, _, _, D, h, w = p2.shape
    # p2[:, :, 0]: (B, 2, 5, h, w) -> (B, 5, h, w, 2)
    coords = jnp.moveaxis(p2[:, :, 0], 1, -1)
    gx = 2.0 * (coords[..., 0] + 0.5) / w - 1.0
    gy = 2.0 * (coords[..., 1] + 0.5) / h - 1.0
    grid = jnp.stack([gx, gy], -1)  # (B, 5, h, w, 2)
    grid_flat = grid.reshape(B, D * h, w, 2)

    f = grid_sample(tgt_feat, grid_flat, "zeros", align_corners=False)
    f = f.reshape(B, D, h, w, -1)

    warped = f[:, 0]
    grads = jnp.stack([(f[:, 1] - f[:, 2]) / 2.0,
                       (f[:, 3] - f[:, 4]) / 2.0], axis=-1)  # (B,h,w,C,2)

    w_warp = grid_sample(tgt_w, grid[:, 0], "zeros", align_corners=False)
    return warped, grads, w_warp


def barron_weight(cost: Array, c: float = 0.1) -> Array:
    """IRLS weight of the Barron robust loss at alpha=0, scale c.

    `scaled_barron(0, 0.1)` (`dualrefine/networks/utils/losses.py:38-82`):
    scaled_loss evaluates barron_loss(x/c^2) whose alpha=0 first derivative
    is 2/(x+2); the Gauss-Newton weighting uses that derivative directly
    (`utils/utils.py:344-348`)."""
    return 2.0 / (cost / (c * c) + 2.0)


def _mask_in_image(coords: Array, w: int, h: int, pad: int = 2) -> Array:
    """Valid-pixel mask for (B, 2, h, w) center-sample coords
    (`utils/utils.py` `_mask_in_image`, pad=2)."""
    x, y = coords[:, 0], coords[:, 1]
    return ((x >= pad) & (x <= w - 1 - pad)
            & (y >= pad) & (y <= h - 1 - pad)).astype(jnp.float32)


def direct_align(poses: Array, K: Array, p2: Array, P2: Array,
                 src_feat: Array, tgt_feat: Array,
                 src_w: Array, tgt_w: Array,
                 weight: Array | None = None,
                 robust_pose_loss: bool = False):
    """One Gauss-Newton step on the feature-metric residual.

    poses: (B, 4, 4); K: (B, 4, 4) at feature scale; p2: (B,2,1,5,h,w)
    projected coords (+grad offsets); P2: (B, 3, h*w) transformed points.
    Returns (new_poses, update (B, 6)).
    """
    B, h, w, C = src_feat.shape
    N = h * w

    warped_tgt, grads, warped_tgt_w = sample_tgt(tgt_feat, tgt_w, p2)

    X, Y, Z = P2[:, 0], P2[:, 1], P2[:, 2]  # (B, N)
    fx = K[:, 0, 0].reshape(-1, 1)
    fy = K[:, 1, 1].reshape(-1, 1)
    fx_Zi = fx / Z
    fy_Zi = fy / Z
    fx_XZ2 = fx_Zi * X / Z
    fy_YZ2 = fy_Zi * Y / Z
    zeros = jnp.zeros_like(fx_XZ2)

    J_row_x = jnp.stack([fx_Zi, zeros, -fx_XZ2, -fx_XZ2 * Y,
                         fx + fx_XZ2 * X, -fx_Zi * Y], axis=-1)
    J_row_y = jnp.stack([zeros, fy_Zi, -fy_YZ2, -fy - fy_YZ2 * Y,
                         fy_YZ2 * X, fy_Zi * X], axis=-1)
    J_pixel_xi = jnp.stack([J_row_x, J_row_y], axis=2)  # (B, N, 2, 6)

    J_img_pixel = grads.reshape(B, N, C, 2)
    J = -jnp.einsum("bncx,bnxk->bnck", J_img_pixel, J_pixel_xi)  # (B,N,C,6)

    res = (src_feat - warped_tgt).reshape(B, N, C, 1)

    wmap = (src_w * warped_tgt_w)
    if weight is not None:
        wmap = wmap * weight
    if robust_pose_loss:
        # `--robust_pose_loss` (`utils/utils.py:344-355`): Barron IRLS
        # weight on the squared channel-summed residual, masked to in-image
        # center samples (pad=2)
        cost = jnp.sum(res[..., 0] ** 2, axis=-1).reshape(B, h, w, 1)
        valid = _mask_in_image(p2[:, :, 0, 0], w, h)[..., None]
        wmap = wmap * barron_weight(cost) * valid
    wvec = wmap.reshape(B, N, 1, 1)

    JW = J * wvec
    H = jnp.einsum("bnck,bncl->bkl", JW, J)       # (B, 6, 6)
    b = -jnp.einsum("bnck,bnco->bk", JW, res)     # (B, 6)

    # Cholesky with guarded fallback (`utils.py:364-374`)
    L, ok = _safe_cholesky(H)
    upd_chol = jax.scipy.linalg.cho_solve((L, True), b[..., None])[..., 0]
    upd_generic = jnp.linalg.solve(
        H + 1e-6 * jnp.eye(6, dtype=H.dtype), b[..., None])[..., 0]
    update = jnp.where(ok[:, None], upd_chol, upd_generic)
    update = jnp.where(jnp.isfinite(update), update, 0.0)

    new_poses = geometry.se3_exp(update) @ poses
    return new_poses, update


def _safe_cholesky(H: Array):
    L = jnp.linalg.cholesky(H)
    ok = jnp.all(jnp.isfinite(L), axis=(-1, -2))
    L = jnp.where(ok[:, None, None], L, jnp.eye(H.shape[-1], dtype=H.dtype))
    return L, ok
