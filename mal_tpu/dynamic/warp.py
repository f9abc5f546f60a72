"""DynamicDepth forward (splatting) warp — pure JAX.

Re-design of `dynamicdepth/rigid_warp.py:534-597` (`forward_warp`) and
`:337-373` (`inverse_warp`): forward-project source pixels with x3-upsampled
depth, z-buffer them into the target grid via a scatter-max over inverse depth
(replacing `torch_sparse.coalesce(op='max')`), then inverse-warp the image
with the inverted pose and the splatted depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mal_tpu import geometry
from mal_tpu.ops.interp import grid_sample

Array = jax.Array


def _upsample_nn(x: Array, factor: int) -> Array:
    """Nearest x-factor upsample of (B, H, W)."""
    B, H, W = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None], (B, H, factor, W, factor))
    return x.reshape(B, H * factor, W * factor)


def inverse_warp(img: Array, depth: Array, T: Array, K3: Array):
    """Sample `img` at target pixels projected by (depth, T).

    img: (B, H, W, C); depth: (B, H, W) target depth; T: (B, 4, 4)
    target->source; K3: (B, 3, 3).
    Returns (warped, valid) with the reference's z-clamp(min=1e-3) and
    align_corners=True zeros-padding sampling (`rigid_warp.py:54-83,337-373`).
    """
    B, H, W, _ = img.shape
    pix = geometry.pixel_grid(H, W, depth.dtype)  # (3, HW)
    rays = jnp.einsum("bij,jn->bin", jnp.linalg.inv(K3), pix)
    cam = rays * depth.reshape(B, 1, -1)
    P = K3 @ T[:, :3, :3]
    t = (K3 @ T[:, :3, 3:])[:, :, 0]
    pc = jnp.einsum("bij,bjn->bin", P, cam, precision="highest") + t[:, :, None]
    z = jnp.maximum(pc[:, 2], 1e-3)
    gx = 2.0 * (pc[:, 0] / z) / (W - 1) - 1.0
    gy = 2.0 * (pc[:, 1] / z) / (H - 1) - 1.0
    grid = jnp.stack([gx, gy], -1).reshape(B, H, W, 2)
    warped = grid_sample(img, grid, padding_mode="zeros", align_corners=True)
    valid = jnp.max(jnp.abs(grid), axis=-1) <= 1.0
    return warped, valid


@functools.partial(jax.jit, static_argnames=("upscale", "dilate"))
def splat_depth(depth: Array, T: Array, K3: Array, upscale: int = 3,
                dilate: bool = False) -> Array:
    """z-buffered forward splat of a depth map; returns inv-depth (B, H, W).

    Depends only on (depth, T, K3) — NOT on the image being warped — so the
    DOMD block (`domd.py`) computes it once per pose and reuses it across
    the color / lookup-frame warps of the same pose.

    `dilate=True` is the TPU fast-mode path: the reference's x`upscale`
    NN-upsampled splat (`rigid_warp.py:534-560`) exists to close sub-pixel
    holes — its 9 sub-points share one inv_z (NN depth) and, at production
    pose magnitudes, land within the 3x3 neighbourhood of the central cell.
    Splatting at 1x and max-dilating the inverse-depth map 3x3 covers the
    same cells with the same inv_z at 1/9 the scatter index count (the
    scatter is index-rate-bound: 87.4 ms at 12.4 M points vs ~10 ms at
    1.4 M on v5e, benchmarks/HISTORY.md round 5 cont.). Differences vs the
    exact splat are confined to boundary cells the sub-point set did not
    actually reach; exact path stays the default for parity oracles.
    """
    B, H, W = depth.shape
    u = 1 if dilate else upscale
    depth_u = _upsample_nn(depth, u) if u > 1 else depth
    Ku = K3 * jnp.asarray([[u], [u], [1.0]], K3.dtype)
    pix = geometry.pixel_grid(H * u, W * u, depth.dtype)
    rays = jnp.einsum("bij,jn->bin", jnp.linalg.inv(Ku), pix)
    cam = rays * depth_u.reshape(B, 1, -1)  # (B, 3, uHW)

    R, t = T[:, :3, :3], T[:, :3, 3:]
    cam_t = jnp.einsum("bij,bjn->bin", R, cam, precision="highest") + t
    Z = jnp.maximum(cam_t[:, 2], 1e-3)
    # project with the ORIGINAL intrinsics -> original-resolution pixels
    P = jnp.einsum("bij,bjn->bin", K3, cam_t / Z[:, None], precision="highest")
    x = P[:, 0]
    y = P[:, 1]

    # truncating cast + sentinel-drop (reference uses .long() then clamps
    # out-of-range to an extra row/col that is dropped)
    xi = jnp.trunc(x).astype(jnp.int32)
    yi = jnp.trunc(y).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (cam_t[:, 2] > 0)

    inv_z = 1.0 / Z
    flat = jnp.where(inb, yi * W + xi, 0)
    vals = jnp.where(inb, inv_z, -jnp.inf)

    def splat(flat_b, vals_b):
        buf = jnp.full((H * W,), -jnp.inf, depth.dtype)
        buf = buf.at[flat_b].max(vals_b)
        return jnp.where(jnp.isfinite(buf) & (buf > 0), buf, 0.0)

    inv_map = jax.vmap(splat)(flat, vals).reshape(B, H, W)
    if dilate:
        inv_map = jax.lax.reduce_window(
            inv_map, 0.0, jax.lax.max, (1, 3, 3), (1, 1, 1),
            [(0, 0), (1, 1), (1, 1)])
    return inv_map


@functools.partial(jax.jit, static_argnames=("upscale", "dilate"))
def forward_warp(img: Array, depth: Array, T: Array, K3: Array,
                 upscale: int = 3, dilate: bool = False,
                 inv_map: Array | None = None):
    """Forward-warp `img` (and depth) from the source view to the view at T.

    img: (B, H, W, C); depth: (B, H, W) source depth; T: (B, 4, 4) source->
    target (the reference passes a [B,3,4] pose); K3: (B, 3, 3).
    Returns (img_w, depth_w, valid), each zeroed outside validity — matching
    `rigid_warp.py:534-597` including the truncating `.long()` pixel cast.
    Pass a precomputed `inv_map` (from `splat_depth`) to share the scatter
    across warps of the same (depth, T).
    """
    B, H, W, _ = img.shape
    if inv_map is None:
        inv_map = splat_depth(depth, T, K3, upscale=upscale, dilate=dilate)
    fw_val = (inv_map > 0)
    depth_w = jnp.where(fw_val, 1.0 / jnp.maximum(inv_map, 1e-12), 0.0)

    # inverse-warp the image using the inverted pose and the splatted depth
    T4 = jnp.broadcast_to(jnp.eye(4, dtype=T.dtype), (B, 4, 4))
    T4 = T4.at[:, :3, :].set(T[:, :3, :])
    T_inv = jnp.linalg.inv(T4)
    img_w, iw_val = inverse_warp(img, depth_w, T_inv, K3)

    valid = (fw_val & iw_val).astype(img.dtype)[..., None]
    return img_w * valid, depth_w * valid[..., 0], valid[..., 0]
