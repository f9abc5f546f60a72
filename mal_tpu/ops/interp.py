"""Bilinear grid sampling and image resizing (pure JAX, NHWC).

`grid_sample` reproduces `torch.nn.functional.grid_sample` semantics exactly
(align_corners / padding_mode) because the reference's photometric losses and
cost volume depend on them bit-for-bit:

- cost-volume feature warp: zeros padding, align_corners=True
  (`manydepth/networks/resnet_encoder.py:189-190`)
- photometric image warp: border padding, align_corners=True
  (`manydepth/trainer.py:1122-1125`)
- RAFT-style samplers in DualRefine: align_corners=False
  (`dualrefine/networks/corr.py:40`)

Resizes mirror `torch.nn.functional.interpolate` (nearest / bilinear with
align_corners=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _unnormalize(coord: Array, size: int, align_corners: bool) -> Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners"))
def grid_sample(img: Array, grid: Array, padding_mode: str = "zeros",
                align_corners: bool = True) -> Array:
    """Bilinear sampling.

    img: (B, H, W, C) NHWC.
    grid: (B, Ho, Wo, 2), last dim is (x, y) in [-1, 1].
    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    out_shape = grid.shape[:-1]  # (B, Ho, Wo)
    n = out_shape[1] * out_shape[2]

    gx = _unnormalize(grid[..., 0].reshape(B, n), W, align_corners)
    gy = _unnormalize(grid[..., 1].reshape(B, n), H, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # bilinear weights (computed pre-clamp, as torch does)
    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    def gather(xi: Array, yi: Array) -> tuple[Array, Array]:
        """Gather img at integer coords; returns (values, in_bounds_mask)."""
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat_idx = yc * W + xc  # (B, n)
        vals = jnp.take_along_axis(
            img.reshape(B, H * W, C), flat_idx[..., None], axis=1
        )  # (B, n, C)
        return vals, inb

    v00, m00 = gather(x0, y0)
    v01, m01 = gather(x1, y0)
    v10, m10 = gather(x0, y1)
    v11, m11 = gather(x1, y1)

    if padding_mode == "zeros":
        v00 = jnp.where(m00[..., None], v00, 0.0)
        v01 = jnp.where(m01[..., None], v01, 0.0)
        v10 = jnp.where(m10[..., None], v10, 0.0)
        v11 = jnp.where(m11[..., None], v11, 0.0)
    elif padding_mode != "border":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out.reshape(out_shape + (C,))


@functools.partial(jax.jit, static_argnames=("height", "width"))
def resize_nearest(img: Array, height: int, width: int) -> Array:
    """Nearest-neighbour resize matching `F.interpolate(mode='nearest')`.

    torch maps dst index i to src index floor(i * in/out).
    img: (B, H, W, C).
    """
    B, H, W, C = img.shape
    ys = jnp.floor(jnp.arange(height) * (H / height)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(width) * (W / width)).astype(jnp.int32)
    return img[:, ys][:, :, xs]


def upsample2x_nearest(img: Array) -> Array:
    """Fast x2 nearest upsample (the decoder hot path, `manydepth/layers.py:204-207`)."""
    B, H, W, C = img.shape
    img = jnp.broadcast_to(img[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return img.reshape(B, H * 2, W * 2, C)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def resize_bilinear(img: Array, height: int, width: int) -> Array:
    """Bilinear resize matching `F.interpolate(mode='bilinear', align_corners=False)`.

    Half-pixel-center sampling with edge clamping, identical to torch.
    img: (B, H, W, C).
    """
    B, H, W, C = img.shape
    if (H, W) == (height, width):
        return img

    def axis_coords(out_size, in_size):
        # half-pixel centers: src = (i + 0.5) * in/out - 0.5, clamped at edges
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * (in_size / out_size) - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        w_hi = src - lo.astype(jnp.float32)
        return lo, hi, w_hi

    y0, y1, wy = axis_coords(height, H)
    x0, x1, wx = axis_coords(width, W)

    top = img[:, y0]  # (B, height, W, C)
    bot = img[:, y1]
    rows = top * (1.0 - wy)[None, :, None, None] + bot * wy[None, :, None, None]
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    out = left * (1.0 - wx)[None, None, :, None] + right * wx[None, None, :, None]
    return out.astype(img.dtype)
