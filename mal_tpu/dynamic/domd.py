"""DOMD teacher-warp: move dynamic objects before photometric/cost-volume use.

Re-design of the DynamicDepth trainer warp block
(`dynamicdepth/trainer.py:492-537`): forward-warp the dynamic-object pixels
of frame 0 into frames ±1 using the frozen teacher's depth and the predicted
poses, blank the objects' old positions via the precomputed `doj_mask±1`, and
overwrite the adjacent color frames (and the cost-volume lookup frames for
non-augmented items) before losses are computed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.dynamic.warp import forward_warp, splat_depth

Array = jax.Array


def domd_warp_inputs(cfg: Config, batch: dict, teacher_disp: Array,
                     T_0m1: Array, T_0p1: Array,
                     aug_mask: Array, lookup_frames: Array,
                     is_train: bool = True):
    """Returns (color_m1, color_p1, lookup_frames) with DOMD warping applied.

    batch must contain `doj_mask` (frame 0) and `doj_mask-1` / `doj_mask+1`,
    each (B, H, W) in {0,1} — the precomputed dynamic-object masks the
    reference datasets load from .npy files
    (`dynamicdepth/datasets/mono_dataset.py:105-110`).
    All outputs are stop-gradiented (the reference runs under no_grad).
    """
    _, teacher_depth = geometry.disp_to_depth(
        jax.lax.stop_gradient(teacher_disp), cfg.min_depth, cfg.max_depth)
    teacher_depth = teacher_depth[..., 0]  # (B, H, W)
    K3 = batch["K"][:, :3, :3]

    doj0 = batch["doj_mask"][..., None]          # (B, H, W, 1)
    tgt = batch["color"]["0"] * doj0             # blank non-object pixels

    # the z-buffer scatter depends only on (depth, T, K): splat ONCE per
    # pose and share across the color / lookup warps below (the scatter is
    # the dominant DOMD cost — see splat_depth's docstring). `dilate` is
    # the fast-mode 1x-splat approximation, auto-on with bf16 fast mode.
    dilate = cfg.domd_splat_dilate
    if dilate is None:
        dilate = (cfg.compute_dtype == "bfloat16"
                  and jax.default_backend() == "tpu")
    T_m1 = jax.lax.stop_gradient(T_0m1)
    T_p1 = jax.lax.stop_gradient(T_0p1)
    inv_m1 = splat_depth(teacher_depth, T_m1, K3, upscale=3, dilate=dilate)

    def warp_into(T, doj_adj, color_adj, inv_map):
        img_w, _, _ = forward_warp(tgt, teacher_depth, T, K3, upscale=3,
                                   inv_map=inv_map)
        out = jnp.where(doj_adj[..., None] == 1, 0.0, color_adj)
        # --no_reproj_doj (`dynamicdepth/trainer.py:507-511,530-534`):
        # blank the warped-object landing zone instead of infilling it with
        # the reprojected object pixels (the lookup-frame branch below has
        # no such gate in the reference)
        out = jnp.where(img_w > 0,
                        0.0 if cfg.no_reproj_doj else img_w, out)
        return jax.lax.stop_gradient(out)

    color_m1 = warp_into(T_m1, batch["doj_mask-1"], batch["color"]["-1"],
                         inv_m1)
    color_p1 = batch["color"]["1"]
    if is_train:
        inv_p1 = splat_depth(teacher_depth, T_p1, K3, upscale=3,
                             dilate=dilate)
        color_p1 = warp_into(T_p1, batch["doj_mask+1"], batch["color"]["1"],
                             inv_p1)

    # cost-volume lookup frames for non-augmented items use the *augmented*
    # current frame's objects (`trainer.py:513-521`); same pose as color_m1
    # -> same splat, shared
    tgt_aug = batch["color_aug"]["0"] * doj0
    img_w_aug, _, _ = forward_warp(tgt_aug, teacher_depth, T_m1, K3,
                                   upscale=3, inv_map=inv_m1)
    warp_frame = lookup_frames[:, 0]
    warp_frame = jnp.where(batch["doj_mask-1"][..., None] == 1, 0.0, warp_frame)
    warp_frame = jnp.where(img_w_aug > 0, img_w_aug, warp_frame)
    non_aug = (aug_mask == 0)[:, None, None, None]
    new_lookup = jnp.where(non_aug[:, None], warp_frame[:, None],
                           lookup_frames)
    return color_m1, color_p1, jax.lax.stop_gradient(new_lookup)
