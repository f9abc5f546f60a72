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
def grid_sample_reference(img: Array, grid: Array, padding_mode: str = "zeros",
                          align_corners: bool = True) -> Array:
    """Bilinear sampling, straightforward 4-gather formulation.

    Kept as the readable reference implementation; `grid_sample` (the packed
    single-gather version below) is bit-identical and ~3x faster on TPU.

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


@functools.partial(jax.jit, static_argnames=("padding_mode", "align_corners"))
def grid_sample_packed(img: Array, grid: Array, padding_mode: str = "zeros",
                       align_corners: bool = True) -> Array:
    """`grid_sample` with all 4 bilinear corners fetched in ONE gather.

    TPU gathers are index-rate-bound; packing the 2x2 corner neighbourhood
    into channels (a cheap fused pad+concat) cuts the index count 4x — ~3x
    faster at image-warp shapes on v5e. Bit-identical to `grid_sample`.
    """
    B, H, W, C = img.shape
    out_shape = grid.shape[:-1]
    n = out_shape[1] * out_shape[2]

    gx = _unnormalize(grid[..., 0].reshape(B, n), W, align_corners)
    gy = _unnormalize(grid[..., 1].reshape(B, n), H, align_corners)

    if padding_mode == "border":
        # clamping the *continuous* coordinate first is exactly equivalent to
        # torch's per-corner index clamping (out-of-range coords collapse to
        # the border texel with total weight 1)
        gx = jnp.clip(gx, 0.0, W - 1)
        gy = jnp.clip(gy, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(padding_mode)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    # packed corners: P[y, x] = [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]]
    padded = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    packed = jnp.concatenate(
        [padded[:, :H, :W], padded[:, :H, 1:W + 1],
         padded[:, 1:H + 1, :W], padded[:, 1:H + 1, 1:W + 1]], axis=-1)
    packed = packed.reshape(B, H * W, 4 * C)

    xc = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    yc = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    g = jnp.take_along_axis(packed, (yc * W + xc)[..., None], axis=1)
    g = g.reshape(B, n, 4, C)

    if padding_mode == "zeros":
        # slot weights must follow the clamped base: when x0=-1 the base
        # clamps to 0, so the in-bounds corner x=0 lives in packed slot 0
        def axis_w(c0, w0, w1, size):
            cc = jnp.clip(c0, 0, size - 1)
            dx = cc - c0  # 0 if aligned, 1 if c0 == -1, >1 fully OOB
            s0 = jnp.where(dx == 0, w0 * (c0 >= 0),
                           jnp.where(dx == 1, w1, 0.0))
            s1 = jnp.where(dx == 0, w1 * (c0 + 1 <= size - 1), 0.0)
            return s0, s1
        xs0, xs1 = axis_w(x0, wx0, wx1, W)
        ys0, ys1 = axis_w(y0, wy0, wy1, H)
        weights = jnp.stack([xs0 * ys0, xs1 * ys0, xs0 * ys1, xs1 * ys1],
                            axis=-1)
    else:
        weights = jnp.stack([wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1],
                            axis=-1)
    out = jnp.einsum("bnkc,bnk->bnc", g, weights)
    return out.reshape(out_shape + (C,))


# the packed formulation is the production grid_sample
grid_sample = grid_sample_packed


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
