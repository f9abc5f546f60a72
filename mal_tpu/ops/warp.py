"""Forward (splatting) warp via z-buffer scatter-max.

TPU-native replacement for the reference's `torch_sparse.coalesce(op='max')`
z-buffer in `dynamicdepth/rigid_warp.py:534-599` (`forward_warp`): JAX scatter
with a `max` combiner compiles to a single XLA scatter, no sparse library
needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mal_tpu import geometry

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("height", "width"))
def zbuffer_scatter_max(pix_xy: Array, values: Array, valid: Array,
                        height: int, width: int) -> Array:
    """Scatter `values` to rounded pixel locations keeping the per-pixel max.

    pix_xy: (B, N, 2) continuous pixel coordinates (x, y).
    values: (B, N) values to splat (use inverse depth for z-buffering).
    valid:  (B, N) boolean; invalid points are dropped.
    Returns (B, height, width); empty pixels are 0.
    """
    x = jnp.round(pix_xy[..., 0]).astype(jnp.int32)
    y = jnp.round(pix_xy[..., 1]).astype(jnp.int32)
    inb = (x >= 0) & (x < width) & (y >= 0) & (y < height) & valid
    # out-of-bounds -> index 0 with value -inf so it never wins the max
    flat = jnp.where(inb, y * width + x, 0)
    vals = jnp.where(inb, values, -jnp.inf)

    def one(flat_b, vals_b):
        buf = jnp.full((height * width,), -jnp.inf, values.dtype)
        buf = buf.at[flat_b].max(vals_b)
        return jnp.where(jnp.isfinite(buf), buf, 0.0)

    out = jax.vmap(one)(flat, vals)
    return out.reshape(-1, height, width)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def forward_splat_depth(depth: Array, T: Array, K: Array, inv_K: Array,
                        mask: Array, height: int, width: int) -> Array:
    """Forward-warp a (masked) depth map into another view; z-buffered.

    depth: (B, H, W) source depth; T: (B, 4, 4) source->target transform;
    mask: (B, H, W) 1 where pixels should be splatted.
    Returns warped target-view depth (B, H, W), 0 where nothing landed.

    Semantics follow `dynamicdepth/rigid_warp.py:534-599`: project masked
    source pixels into the target view, keep the *nearest* surface per target
    pixel via max over inverse depth, then return depth = 1 / inv_depth.
    """
    B = depth.shape[0]
    points = geometry.backproject(depth, inv_K, height, width)  # (B, 4, HW)
    P = (K @ T)[:, :3, :]
    cam = P @ points  # (B, 3, HW)
    z = cam[:, 2, :]
    xy = cam[:, :2, :] / (z[:, None] + 1e-7)
    pix = jnp.moveaxis(xy, 1, 2)  # (B, HW, 2)

    inv_z = 1.0 / jnp.maximum(z, 1e-7)
    valid = (mask.reshape(B, -1) > 0) & (z.reshape(B, -1) > 1e-4)
    inv_map = zbuffer_scatter_max(pix, inv_z, valid, height, width)
    return jnp.where(inv_map > 0, 1.0 / jnp.maximum(inv_map, 1e-7), 0.0)
