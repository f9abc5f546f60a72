"""DynamicDepth `--eval_mode` loop (`dynamicdepth/trainer.py:266-273,756-905`).

The README-documented DynamicDepth+MAL entry: run full validation then exit.
Per batch (the reference indexes GT and doj masks per *batch*, so this is a
batch-size-1 protocol, `trainer.py:1177,1228-1230`):

  poses -> teacher -> DOMD warp (val variant) -> occlusion-aware cost volume
  -> student disp, then `compute_depth_losses` (`trainer.py:1158-1255`):
  depth (not disp) bilinearly resized to GT, clamped to [1e-3, 80], CS ego-car
  + center crops, median scaling, 7 metrics over the valid mask, and the same
  metrics restricted to valid & dynamic-object ("doj") pixels. Batch metrics
  accumulate with equal weight; doj metrics average over batches that contain
  any doj pixel.
"""

from __future__ import annotations

import os
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.eval.metrics import compute_depth_errors_np
from mal_tpu.ops.interp import resize_bilinear, resize_nearest

Array = jax.Array

EVAL_MIN_DEPTH = 1e-3
EVAL_MAX_DEPTH = 80.0


def convert_dynamic_checkpoint_dir(folder: str,
                                   only: tuple[str, ...] | None = None):
    """Per-net `.pth` dir -> (params, batch_stats, extras) for `DynDepthModel`.

    The reference's dynamicdepth nets share the ManyDepth layouts
    (`dynamicdepth/trainer.py:127-167`); `DynDepthModel` hoists the matching
    encoder's trunk + reduce_conv to the top level, so re-nest those (an
    `only` subset naming "encoder" covers BOTH hoisted keys — the
    reference's "encoder" net includes reduce_conv).
    """
    from mal_tpu.convert import convert_mal_checkpoint_dir

    params, stats, extras = convert_mal_checkpoint_dir(folder, only=only)
    if "encoder" in params:
        enc_p = params.pop("encoder")
        enc_s = stats.pop("encoder")
        params["encoder"] = enc_p["encoder"]
        params["reduce_conv"] = enc_p["reduce_conv"]
        stats["encoder"] = enc_s["encoder"]
    return params, stats, extras


def _metrics_one(gt_depth: np.ndarray, depth_pred: np.ndarray,
                 doj_mask: np.ndarray, eval_split: str,
                 split: str) -> tuple[dict, dict, int]:
    """`compute_depth_losses` for one image. Returns (metrics, doj_metrics,
    has_doj)."""
    if split == "cityscapes_preprocessed":
        gt_h = int(round(gt_depth.shape[0] * 0.75))
        gt_depth = gt_depth[:gt_h]
    gt_h, gt_w = gt_depth.shape[:2]

    pred = np.asarray(resize_bilinear(
        jnp.asarray(depth_pred)[None, :, :, None], gt_h, gt_w))[0, :, :, 0]
    pred = np.clip(pred, EVAL_MIN_DEPTH, EVAL_MAX_DEPTH)
    doj = np.asarray(resize_nearest(
        jnp.asarray(doj_mask.astype(np.float32))[None, :, :, None],
        gt_h, gt_w))[0, :, :, 0]

    if split == "cityscapes_preprocessed":
        gt_depth = gt_depth[256:, 192:1856]
        pred = pred[256:, 192:1856]
        doj = doj[256:, 192:1856]

    mask = np.logical_and(gt_depth > EVAL_MIN_DEPTH, gt_depth < EVAL_MAX_DEPTH)
    if eval_split in ("eigen", "eigen_benchmark"):
        h, w = gt_depth.shape[:2]
        crop = np.array([0.40810811 * h, 0.99189189 * h,
                         0.03594771 * w, 0.96405229 * w]).astype(np.int32)
        crop_mask = np.zeros_like(mask)
        crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
        mask = np.logical_and(mask, crop_mask)

    pred = pred * (np.median(gt_depth[mask]) / np.median(pred[mask]))
    pred = np.clip(pred, EVAL_MIN_DEPTH, EVAL_MAX_DEPTH)

    doj_sel = mask & (doj > 0.5)
    errors = compute_depth_errors_np(gt_depth[mask], pred[mask])
    has_doj = int(doj_sel.sum() > 0)
    doj_errors = (compute_depth_errors_np(gt_depth[doj_sel], pred[doj_sel])
                  if has_doj else {k: 0.0 for k in errors})
    return errors, doj_errors, has_doj


def evaluate_dynamic(cfg: Config, variables: dict, batches: Iterable[dict],
                     gt_depths, min_depth_bin=0.1, max_depth_bin=10.0,
                     mono_eval: bool = True) -> dict:
    """Full eval loop; returns {"<m>", "doj/<m>", "mono/<m>", "mono_doj/<m>"}."""
    from mal_tpu.dynamic.model import DynDepthModel

    model = DynDepthModel(cfg)

    def forward(batch):
        out = model.apply(variables, batch, jnp.asarray(min_depth_bin),
                          jnp.asarray(max_depth_bin), jax.random.PRNGKey(0),
                          train=False, is_train_phase=False, mutable=False)
        _, depth = geometry.disp_to_depth(out["disp"], cfg.min_depth,
                                          cfg.max_depth)
        _, mono_depth = geometry.disp_to_depth(out["mono_disp"], cfg.min_depth,
                                               cfg.max_depth)
        return depth[..., 0], mono_depth[..., 0]

    fwd = jax.jit(forward)

    sums: dict[str, float] = {}
    n_batches = 0
    n_doj = 0
    idx = 0
    for batch in batches:
        jb = jax.tree.map(jnp.asarray, batch)
        depth, mono_depth = jax.device_get(fwd(jb))
        B = depth.shape[0]
        for b in range(B):
            gt = gt_depths[idx]
            doj = np.asarray(batch["doj_mask"][b]) if "doj_mask" in batch \
                else np.zeros(depth.shape[1:3], np.float32)
            err, doj_err, has = _metrics_one(gt, depth[b], doj,
                                             cfg.eval_split, cfg.split)
            streams = [("", err), ("doj/", doj_err)]
            if mono_eval:
                merr, mdoj, _ = _metrics_one(gt, mono_depth[b], doj,
                                             cfg.eval_split, cfg.split)
                streams += [("mono/", merr), ("mono_doj/", mdoj)]
            for pre, e in streams:
                for k, v in e.items():
                    sums[pre + k] = sums.get(pre + k, 0.0) + float(v)
            n_batches += 1
            n_doj += has
            idx += 1

    out = {}
    for k, v in sums.items():
        denom = n_doj if ("doj/" in k and n_doj > 0) else n_batches
        out[k] = v / max(denom, 1)
    out["doj_batches"] = float(n_doj)
    out["n_images"] = float(n_batches)
    return out


def run_dynamic_eval(cfg: Config, ckpt: str, loader, gt_path: str) -> dict:
    """CLI entry: convert the checkpoint dir, load GT depths, run the loop.

    gt_path: an `.npz` with key "data" (KITTI-style) or a directory of
    `NNN_depth.npy` files (the reference's CityScapes layout,
    `trainer.py:1177`).
    """
    folder = ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
    params, stats, extras = convert_dynamic_checkpoint_dir(folder)
    variables = {"params": params, "batch_stats": stats}

    if os.path.isdir(gt_path):
        files = sorted(f for f in os.listdir(gt_path)
                       if f.endswith("_depth.npy"))
        gt_depths = [np.load(os.path.join(gt_path, f)) for f in files]
    else:
        gt_depths = np.load(gt_path, fix_imports=True, encoding="latin1",
                            allow_pickle=True)["data"]

    return evaluate_dynamic(
        cfg, variables, iter(loader), gt_depths,
        min_depth_bin=float(extras.get("min_depth_bin", 0.1)),
        max_depth_bin=float(extras.get("max_depth_bin", 10.0)))
