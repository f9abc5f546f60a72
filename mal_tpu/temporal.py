"""MAL temporal hint: dynamic-object motion-midpoint synthesis (pure JAX).

Re-design of `manydepth/dyn_utils.py` (`image_synthesis`,
`generate_dynamic_instance`, `fill_dynamic_obj`): dynamic objects detected in
the current frame are matched to instances in the warped adjacent frames, and
each object's pixels are shifted to its motion-interpolated midpoint (half the
bbox-extent delta), with background infill from the other adjacent frame.

Everything is static-shape and vmapped over (batch, instance-slot): the
reference's per-item / per-instance Python loops become rolls + masks. When an
item has no matched instances, its synthesized image equals the warped image
— which makes the extra min-reprojection candidates a no-op, exactly
equivalent to the reference's `has_ins=False` skip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mal_tpu.segment.instances import Instances
from mal_tpu.segment.matcher import match_instances

Array = jax.Array


def _bbox_bounds(mask: Array):
    """Per-instance bbox bounds with the reference's exact index arithmetic
    (`dyn_utils.py:53-78`): occupancy is detected via index-weighted sums, so
    a row/column at index 0 counts as empty — quirk preserved.

    mask: (N, H, W) bool. Returns (low, top, right, left), each (N,) int32.
    """
    N, H, W = mask.shape
    grid_h = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    grid_w = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inf = (H + 1) * (W + 1)

    rows = jnp.arange(H, dtype=jnp.int32)
    cols = jnp.arange(W, dtype=jnp.int32)

    h_sum = (mask * grid_h).sum(axis=2)             # (N, H)
    h_nz = jnp.where(h_sum == 0, 0, rows[None, :])
    low = jnp.argmax(h_nz, axis=1).astype(jnp.int32)
    h_nz_inf = jnp.where(h_nz == 0, inf, h_nz)
    top = jnp.argmin(h_nz_inf, axis=1).astype(jnp.int32)

    w_sum = (mask * grid_w).sum(axis=1)             # (N, W)
    w_nz = jnp.where(w_sum == 0, 0, cols[None, :])
    right = jnp.argmax(w_nz, axis=1).astype(jnp.int32)
    w_nz_inf = jnp.where(w_nz == 0, inf, w_nz)
    left = jnp.argmin(w_nz_inf, axis=1).astype(jnp.int32)
    return low, top, right, left


def _shift2d(x: Array, dy: Array, dx: Array) -> Array:
    """Shift a (H, W) or (H, W, C) array by (dy rows, dx cols), zero-filled.

    Equivalent to the reference's slice-copy (`dyn_utils.py:6-25`) for
    arbitrary-signed dynamic shifts.
    """
    H, W = x.shape[0], x.shape[1]
    rolled = jnp.roll(x, shift=(dy, dx), axis=(0, 1))
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    valid = ((rows - dy >= 0) & (rows - dy < H)
             & (cols - dx >= 0) & (cols - dx < W))
    if x.ndim == 3:
        valid = valid[..., None]
    return jnp.where(valid, rolled, 0)


def _fill_dynamic_obj(mask: Array, delta_x: Array, delta_y: Array,
                      source: Array, img_bg: Array) -> Array:
    """Move each instance's pixels by its (delta_x rows, delta_y cols).

    mask: (N, H, W) bool; source, img_bg: (H, W, C).
    Reference: `dyn_utils.py:5-36` (sum over shifted instances, OR of shifted
    masks, background elsewhere).
    """
    def move_one(m, dx, dy):
        src_mv = _shift2d(source, dx, dy)
        m_mv = _shift2d(m.astype(source.dtype), dx, dy) > 0
        return src_mv * m_mv[..., None], m_mv

    img_mv, mask_mv = jax.vmap(move_one)(mask, delta_x, delta_y)
    img_sum = img_mv.sum(axis=0)                # (H, W, C)
    mask_or = jnp.any(mask_mv, axis=0)          # (H, W)
    return jnp.where(mask_or[..., None], img_sum, img_bg)


def generate_dynamic_instance(mask_last: Array, mask_next: Array,
                              img_last: Array, img_next: Array,
                              replace: bool = False):
    """One image: synthesize midpoint-position objects in both warped frames.

    mask_*: (N, H, W) bool matched instance masks; img_*: (H, W, C).
    Reference: `dyn_utils.py:38-119`.
    """
    mask_or_any = jnp.any(mask_last | mask_next, axis=0)  # (H, W)

    low_l, top_l, right_l, left_l = _bbox_bounds(mask_last)
    low_n, top_n, right_n, left_n = _bbox_bounds(mask_next)

    def pick(d1, d2):
        pair = jnp.stack([d1, d2], axis=1)          # (N, 2)
        idx = jnp.argmax(jnp.abs(pair), axis=1)
        return jnp.take_along_axis(pair, idx[:, None], axis=1)[:, 0]

    delta_x = pick(low_n - low_l, top_n - top_l)
    delta_y = pick(right_n - right_l, left_n - left_l)
    disp_x = jnp.round(delta_x / 2.0).astype(jnp.int32)
    disp_y = jnp.round(delta_y / 2.0).astype(jnp.int32)

    if replace:
        small = (jnp.abs(disp_x) < 3)
        dx_last = jnp.where(small, 0, disp_x)
        dx_next = jnp.where(small, 0, -disp_x)
        small_y = (jnp.abs(disp_y) < 3)
        dy_last = jnp.where(small_y, 0, disp_y)
        dy_next = jnp.where(small_y, 0, -disp_y)
    else:
        dx_last, dy_last = disp_x, disp_y
        dx_next, dy_next = -disp_x, -disp_y

    # background infill: pixels the object vacates come from the other frame
    vac_last = jnp.any(mask_last & ~mask_next, axis=0)
    img_bg = jnp.where(vac_last[..., None], img_next, img_last)
    vac_next = jnp.any(mask_next & ~mask_last, axis=0)
    img_bg2 = jnp.where(vac_next[..., None], img_last, img_next)

    syn_last = _fill_dynamic_obj(mask_last, dx_last, dy_last, img_last, img_bg)
    out_last = jnp.where(mask_or_any[..., None], syn_last, img_last)

    syn_next = _fill_dynamic_obj(mask_next, dx_next, dy_next, img_next, img_bg2)
    out_next = jnp.where(mask_or_any[..., None], syn_next, img_next)
    return out_last, out_next


def image_synthesis(warped_last: Array, warped_next: Array,
                    inst_cur: Instances, inst_last: Instances,
                    inst_next: Instances, score_thresh: float = 0.5,
                    payload_dtype=None):
    """Batch temporal-hint synthesis (`dyn_utils.py:121-170`).

    warped_*: (B, H, W, C) warped adjacent frames from the photometric path.
    inst_cur: instances of the current frame; inst_last/next: instances of the
    *warped* adjacent frames. Returns (syn_last, syn_next, has_ins) where
    has_ins is (B,) bool.

    `payload_dtype=bf16` (TPU fast mode) moves the per-instance image
    shifts — N full-res dynamic rolls per frame, the dominant synthesis
    traffic — in bf16, like the photometric warp payload; outputs are cast
    back, gradients flow through the casts.
    """
    out_dtype = warped_last.dtype
    if payload_dtype is not None:
        warped_last = warped_last.astype(payload_dtype)
        warped_next = warped_next.astype(payload_dtype)
    cur = inst_cur.threshold(score_thresh)
    last_idx, next_idx, pair_valid = match_instances(inst_last, inst_next, cur)
    pair_valid = pair_valid & cur.valid

    def one(w_last, w_next, il_masks, in_masks, li, ni, pv):
        m_last = (jnp.take(il_masks, li, axis=0) > 0.5) & pv[:, None, None]
        m_next = (jnp.take(in_masks, ni, axis=0) > 0.5) & pv[:, None, None]
        syn_l, syn_n = generate_dynamic_instance(m_last, m_next, w_last, w_next)
        has = jnp.any(pv)
        syn_l = jnp.where(has, syn_l, w_last)
        syn_n = jnp.where(has, syn_n, w_next)
        return syn_l, syn_n, has

    syn_l, syn_n, has = jax.vmap(one)(
        warped_last, warped_next, inst_last.masks, inst_next.masks,
        last_idx, next_idx, pair_valid)
    return syn_l.astype(out_dtype), syn_n.astype(out_dtype), has
