"""Differentiable camera geometry (pure JAX, NHWC).

One shared implementation of the geometry kernels that the reference keeps in
four near-identical copies (`manydepth/layers.py:14-199`,
`dynamicdepth/layers.py`, `dualrefine/layers.py:29-56`,
`manydepth/networks/layers.py`). Everything is batched, static-shape, and
vmap/jit friendly; there are no module classes — just functions over arrays.

Conventions
-----------
- Images are NHWC (TPU-native), not NCHW.
- Pixel coordinates are (x, y) with x = column index, matching the reference's
  meshgrid ordering (`manydepth/layers.py:149`).
- Intrinsics `K` are 4x4 with the full-resolution pixel scaling already
  applied; per-scale intrinsics are derived with `scale_intrinsics`.
- `grid` coordinates for sampling are normalized to [-1, 1] (align_corners
  semantics identical to `torch.nn.functional.grid_sample(align_corners=True)`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def disp_to_depth(disp: Array, min_depth: float, max_depth: float):
    """Sigmoid disparity -> (scaled_disp, depth).

    Reference: `manydepth/layers.py:14-23`.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth: Array, min_depth: float, max_depth: float) -> Array:
    """Inverse of `disp_to_depth` (used for checkpoint round-trips)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = 1.0 / depth
    return (scaled_disp - min_disp) / (max_disp - min_disp)


def rot_from_axisangle(vec: Array) -> Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 4, 4) via Rodrigues.

    Matches `manydepth/layers.py:61-100` including the 1e-7 angle guard.
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (..., 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rot = jnp.stack(
        [
            x * xC + ca, xyC - zs, zxC + ys, zeros,
            xyC + zs, y * yC + ca, yzC - xs, zeros,
            zxC - ys, yzC + xs, z * zC + ca, zeros,
            zeros, zeros, zeros, ones,
        ],
        axis=-1,
    )
    return rot.reshape(vec.shape[:-1] + (4, 4))


def translation_matrix(t: Array) -> Array:
    """Translation (..., 3) -> (..., 4, 4). Reference: `manydepth/layers.py:45-58`."""
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), t.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(t)


def transformation_from_parameters(
    axisangle: Array, translation: Array, invert: bool = False
) -> Array:
    """(axis-angle, translation) -> SE(3) 4x4.

    `invert=True` composes the inverse transform exactly as the reference does
    (transpose R, negate t, M = R^T @ Trans(-t); `manydepth/layers.py:26-42`).
    """
    R = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        R = jnp.swapaxes(R, -1, -2)
        t = -t
    T = translation_matrix(t)
    if invert:
        return R @ T
    return T @ R


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> Array:
    """Homogeneous pixel coordinates (3, H*W): rows are (x, y, 1)."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")  # each (H, W)
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([gx, gy, ones], axis=0).reshape(3, height * width)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def backproject(depth: Array, inv_K: Array, height: int, width: int) -> Array:
    """Depth map -> homogeneous camera-frame points.

    depth: (B, H, W) or (B, H, W, 1); inv_K: (B, 4, 4).
    Returns (B, 4, H*W). Reference: `manydepth/layers.py:138-168`.
    """
    pix = pixel_grid(height, width, depth.dtype)  # (3, HW)
    cam_rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision="highest")  # (B, 3, HW)
    d = depth.reshape(depth.shape[0], 1, height * width)
    cam_points = d * cam_rays
    ones = jnp.ones((depth.shape[0], 1, height * width), depth.dtype)
    return jnp.concatenate([cam_points, ones], axis=1)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def project_3d(points: Array, K: Array, T: Array, height: int, width: int,
               eps: float = 1e-7) -> Array:
    """Project homogeneous 3D points into a camera at pose T.

    points: (B, 4, H*W); K, T: (B, 4, 4).
    Returns normalized grid coords (B, H, W, 2) in [-1, 1].
    Reference: `manydepth/layers.py:171-199`.
    """
    P = (K @ T)[:, :3, :]  # (B, 3, 4)
    cam_points = jnp.einsum("bij,bjn->bin", P, points, precision="highest")  # (B, 3, HW)
    pix = cam_points[:, :2, :] / _safe_denom(cam_points[:, 2:3, :] + eps)
    pix = pix.reshape(-1, 2, height, width).transpose(0, 2, 3, 1)  # (B,H,W,2)
    scale = jnp.asarray([width - 1, height - 1], pix.dtype)
    grid = (pix / scale - 0.5) * 2.0
    # Coordinates far outside [-1, 1] behave identically under border/zeros
    # sampling; clipping them (a) keeps that behaviour bit-for-bit and
    # (b) zeroes the backward cotangent before it multiplies the enormous
    # -xy/z^2 projective Jacobian of near-camera-plane points, which
    # otherwise overflows gradients to inf (and Adam turns inf into NaN).
    return jnp.clip(grid, -10.0, 10.0)


def project_3d_center(points: Array, K: Array, T: Array, height: int,
                      width: int, eps: float = 1e-7) -> Array:
    """`project_3d` with DualRefine's pixel-CENTER normalization:
    grid = 2*(pix + 0.5)/W - 1 (`dualrefine/layers.py:216-226`), the
    convention matching grid_sample align_corners=False (ManyDepth uses
    (W-1)-edge normalization with align_corners=True instead)."""
    P = (K @ T)[:, :3, :]
    cam_points = jnp.einsum("bij,bjn->bin", P, points, precision="highest")
    pix = cam_points[:, :2, :] / _safe_denom(cam_points[:, 2:3, :] + eps)
    pix = pix.reshape(-1, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.asarray([width, height], pix.dtype)
    grid = 2.0 * (pix + 0.5) / scale - 1.0
    return jnp.clip(grid, -10.0, 10.0)  # see project_3d for why


def _safe_denom(z: Array, floor: float = 1e-6) -> Array:
    """Sign-preserving clamp of a projective denominator away from zero.

    Points with |z| < 1e-6 sit on the camera plane and land far outside the
    image either way (the warp border/zeros handling discards them), but an
    unguarded divide makes the *backward* pass compute -xy/z^2 = inf, and
    inf * (masked-zero cotangent) = NaN — which was poisoning whole training
    steps. Forward values are unchanged for any physically meaningful sample.
    """
    return jnp.where(jnp.abs(z) < floor, jnp.where(z < 0, -floor, floor), z)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def project_3d_with_depth(points: Array, K: Array, T: Array,
                          height: int, width: int, eps: float = 1e-7):
    """Like `project_3d` but also returns the projected z (computed depth).

    Reference: `manydepth/networks/layers.py` Project3D(dc=True).
    """
    P = (K @ T)[:, :3, :]
    cam_points = jnp.einsum("bij,bjn->bin", P, points, precision="highest")
    z = cam_points[:, 2, :].reshape(-1, height, width)
    pix = cam_points[:, :2, :] / _safe_denom(cam_points[:, 2:3, :] + eps)
    pix = pix.reshape(-1, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.asarray([width - 1, height - 1], pix.dtype)
    return (pix / scale - 0.5) * 2.0, z


def scale_intrinsics(K: Array, scale: int) -> Array:
    """Downscale full-resolution intrinsics by 2**scale (rows 0 and 1)."""
    factor = jnp.asarray(
        [1.0 / (2 ** scale), 1.0 / (2 ** scale), 1.0, 1.0], K.dtype
    )
    return K * factor[None, :, None]


def make_K(fx: float, fy: float, cx: float, cy: float,
           width: int, height: int, dtype=jnp.float32) -> Array:
    """Build a 4x4 intrinsics matrix from *normalized* intrinsics.

    The KITTI loader uses normalized K = [[0.58,0,0.5],[0,1.92,0.5]] scaled by
    (W, H) (`manydepth/datasets/kitti_dataset.py:19-40`).
    """
    K = jnp.eye(4, dtype=dtype)
    K = K.at[0, 0].set(fx * width)
    K = K.at[1, 1].set(fy * height)
    K = K.at[0, 2].set(cx * width)
    K = K.at[1, 2].set(cy * height)
    return K


def se3_exp(xi: Array) -> Array:
    """SE(3) exponential map: twist (..., 6) [v, w] -> 4x4 transform.

    Used by the DualRefine Gauss-Newton pose update
    (`dualrefine/layers.py:29-56`).
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)  # (..., 1)
    theta = jnp.maximum(theta, 1e-12)
    W = skew(w / theta)
    th = theta[..., None]  # (..., 1, 1)
    sin_t, cos_t = jnp.sin(th), jnp.cos(th)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + sin_t * W + (1.0 - cos_t) * (W @ W)
    V = eye + (1.0 - cos_t) / th * W + (th - sin_t) / th * (W @ W)
    # Guard small angles: R ~ I + skew(w), V ~ I
    small = (theta[..., None] < 1e-6)
    R = jnp.where(small, eye + skew(w), R)
    V = jnp.where(small, eye, V)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], xi.dtype), xi.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def skew(v: Array) -> Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    m = jnp.stack([zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))
