"""Plane-sweep cost volume (pure JAX, fully batched).

TPU-first re-design of `manydepth/networks/resnet_encoder.py:151-233`
(`match_features`): the reference loops over batch items and lookup frames in
Python and materializes a (D, C, h, w) warped-feature tensor per step; here
everything is batched over (batch, frame) with a `lax.scan` over depth-bin
chunks so peak memory is (B, F, chunk, h, w, C) regardless of D.

The whole volume is a constant w.r.t. parameters (the reference computes it
under `torch.no_grad()`, `resnet_encoder.py:292-305`); callers should
`stop_gradient` the inputs, which this module does not do itself.

Numerics match the reference exactly: zeros-padding align_corners=True
bilinear warp, border-2 edge masking on both images, L1 feature difference
averaged over channels, per-pixel frame counting with 1e-7 guard,
missing-value -> max fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from mal_tpu import geometry
from mal_tpu.ops.interp import grid_sample
from mal_tpu.parallel.mesh import constrain

Array = jax.Array


def compute_depth_bins(min_depth: Array, max_depth: Array, num_bins: int,
                       binning: str = "linear") -> Array:
    """Depth hypothesis planes. Reference: `resnet_encoder.py:121-148`."""
    min_depth = jnp.asarray(min_depth, jnp.float32).reshape(())
    max_depth = jnp.asarray(max_depth, jnp.float32).reshape(())
    if binning == "linear":
        return jnp.linspace(min_depth, max_depth, num_bins)
    if binning == "inverse":
        inv = jnp.linspace(1.0 / max_depth, 1.0 / min_depth, num_bins)
        return 1.0 / inv[::-1]  # ascending depth, linear in inverse depth
    if binning == "log":
        i = jnp.arange(num_bins, dtype=jnp.float32)
        return jnp.exp(jnp.log(min_depth) + jnp.log(max_depth / min_depth) * i / num_bins)
    raise NotImplementedError(binning)


def _border2_mask(h: int, w: int, dtype) -> Array:
    """Static mask zeroing a 2-pixel border (ResNet zero-padding shadow)."""
    m = jnp.zeros((h, w), dtype)
    return m.at[2:-2, 2:-2].set(1.0)


@functools.partial(
    jax.jit, static_argnames=("chunk", "set_missing_to_max")
)
def plane_sweep_cost_volume(
    cur_feats: Array,      # (B, h, w, C)
    lookup_feats: Array,   # (B, F, h, w, C)
    rel_poses: Array,      # (B, F, 4, 4) — all-zero pose marks a missing frame
    K: Array,              # (B, 4, 4) intrinsics at feature scale
    inv_K: Array,          # (B, 4, 4)
    depth_bins: Array,     # (D,)
    chunk: int = 16,
    set_missing_to_max: bool = True,
):
    """Returns (cost_volume, missing_mask), each (B, D, h, w)."""
    B, h, w, C = cur_feats.shape
    F = lookup_feats.shape[1]
    D = depth_bins.shape[0]
    assert D % chunk == 0, f"num_depth_bins {D} must be divisible by chunk {chunk}"

    dtype = cur_feats.dtype
    pix = geometry.pixel_grid(h, w, jnp.float32)  # (3, HW)

    # Per-(b, f) projective precompute: pix_h(d) = d * (A @ pix) + t
    P = (K[:, None] @ rel_poses)[:, :, :3, :]          # (B, F, 3, 4)
    rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix, precision="highest")  # (B, 3, HW)
    A = jnp.einsum("bfij,bjn->bfin", P[:, :, :, :3], rays, precision="highest")   # (B, F, 3, HW)
    t = P[:, :, :, 3]                                        # (B, F, 3)

    valid_frame = (jnp.sum(jnp.abs(rel_poses), axis=(-1, -2)) != 0)  # (B, F)
    valid_frame = valid_frame.astype(dtype)[:, :, None, None, None]  # (B,F,1,1,1)

    border = _border2_mask(h, w, dtype)  # (h, w)
    scale = jnp.asarray([w - 1, h - 1], jnp.float32)

    lookup_flat = lookup_feats.reshape(B * F, h, w, C)

    def chunk_body(_, d_chunk):
        # d_chunk: (chunk,) depths
        d = d_chunk[None, None, :, None, None]                  # (1,1,Dc,1,1)
        cam = d * A[:, :, None] + t[:, :, None, :, None]        # (B,F,Dc,3,HW)
        xy = cam[:, :, :, :2, :] / (cam[:, :, :, 2:3, :] + 1e-7)
        xy = xy.reshape(B, F, chunk, 2, h, w)
        xy = jnp.moveaxis(xy, 3, -1)                            # (B,F,Dc,h,w,2)
        grid = (xy / scale - 0.5) * 2.0

        # one big batched sample: fold (F) into batch and (Dc*h) into rows
        grid_bf = grid.reshape(B * F, chunk * h, w, 2)
        warped = grid_sample(lookup_flat, grid_bf, padding_mode="zeros",
                             align_corners=True)
        warped = warped.reshape(B, F, chunk, h, w, C)

        # edge mask: lookup-image borders (per sample) x current-image borders
        x_v = (grid[..., 0] / 2.0 + 0.5) * (w - 1)
        y_v = (grid[..., 1] / 2.0 + 0.5) * (h - 1)
        edge = ((x_v >= 2.0) & (x_v <= w - 2) & (y_v >= 2.0) & (y_v <= h - 2))
        edge = edge.astype(dtype) * border  # (B,F,Dc,h,w)

        diffs = jnp.mean(jnp.abs(warped - cur_feats[:, None, None]), axis=-1)
        diffs = diffs * edge * valid_frame                      # (B,F,Dc,h,w)
        # depth-plane sharding (active only under a mesh with a "depth"
        # axis AND chunk == D — the domain's sequence parallelism; with the
        # scan each device would still execute every chunk)
        diffs = constrain(diffs, "data", None, "depth", None, None)

        cost_c = jnp.sum(diffs, axis=1)                         # (B,Dc,h,w)
        counts_c = jnp.sum((diffs > 0).astype(dtype), axis=1)
        return None, (cost_c, counts_c)

    d_chunks = depth_bins.astype(jnp.float32).reshape(D // chunk, chunk)
    if D == chunk:
        # single-chunk path (used by depth-plane sharding): no scan, so
        # GSPMD can split the D axis across devices
        cost, counts = chunk_body(None, d_chunks[0])[1]
        cost = constrain(cost, "data", "depth", None, None)
        counts = constrain(counts, "data", "depth", None, None)
    else:
        _, (cost, counts) = lax.scan(chunk_body, None, d_chunks)
        # (D//chunk, B, chunk, h, w) -> (B, D, h, w)
        cost = jnp.moveaxis(cost, 0, 1).reshape(B, D, h, w)
        counts = jnp.moveaxis(counts, 0, 1).reshape(B, D, h, w)

    cost = cost / (counts + 1e-7)
    missing = (cost == 0).astype(dtype)
    if set_missing_to_max:
        cost = cost * (1.0 - missing) + jnp.max(cost, axis=1, keepdims=True) * missing
    return cost, missing


def confidence_mask_from_cost(cost_volume: Array, missing_mask: Array,
                              num_bins_threshold: int | None = None) -> Array:
    """Pixels where every depth bin was observed. Reference: `resnet_encoder.py:255-262`."""
    D = cost_volume.shape[1]
    if num_bins_threshold is None:
        num_bins_threshold = D
    observed = ((cost_volume * (1.0 - missing_mask)) > 0).sum(axis=1)
    return (observed == num_bins_threshold).astype(cost_volume.dtype)


def indices_to_disparity(cost_volume: Array, depth_bins: Array) -> Array:
    """Argmin-cost disparity (0-cost entries ignored). Reference: `resnet_encoder.py:247-253,309-313`."""
    viz = jnp.where(cost_volume == 0, 100.0, cost_volume)
    argmin = jnp.argmin(viz, axis=1)  # (B, h, w)
    return 1.0 / depth_bins[argmin]
