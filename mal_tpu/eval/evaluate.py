"""Depth evaluation protocol (host-side numpy + jit model inference).

Reproduces `manydepth/evaluate_depth.py:66-288` (`validate`): scaled-disparity
inference with eval-time depth range [1e-3, 80], bilinear resize of the
disparity to GT resolution, Garg/eigen crop or CityScapes center crop, median
scaling, clipping, and the 7-metric mean.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.eval.metrics import compute_depth_errors_np
from mal_tpu.ops.interp import resize_bilinear

# eval-time depth range (`manydepth/evaluate_depth.py:296-299`)
EVAL_MIN_DEPTH = 1e-3
EVAL_MAX_DEPTH = 80.0


def _resize_disp(disp: np.ndarray, gt_h: int, gt_w: int) -> np.ndarray:
    """cv2.resize(INTER_LINEAR) equivalent (half-pixel bilinear)."""
    out = resize_bilinear(jnp.asarray(disp)[None, :, :, None], gt_h, gt_w)
    return np.asarray(out)[0, :, :, 0]


def prepare_gt_and_pred(gt_depth: np.ndarray, pred_disp: np.ndarray,
                        eval_split: str = "eigen",
                        min_depth: float = EVAL_MIN_DEPTH,
                        max_depth: float = EVAL_MAX_DEPTH,
                        median_scaling: bool = True,
                        pred_depth_scale_factor: float = 1.0):
    """One image: returns (masked_gt, masked_scaled_pred, ratio)."""
    if eval_split == "cityscapes":
        gt_height = int(round(gt_depth.shape[0] * 0.75))
        gt_depth = gt_depth[:gt_height]

    gt_h, gt_w = gt_depth.shape[:2]
    pred_depth = 1.0 / _resize_disp(pred_disp, gt_h, gt_w)

    if eval_split == "cityscapes":
        gt_depth = gt_depth[256:, 192:1856]
        pred_depth = pred_depth[256:, 192:1856]

    if eval_split == "eigen":
        mask = np.logical_and(gt_depth > min_depth, gt_depth < max_depth)
        crop = np.array([0.40810811 * gt_h, 0.99189189 * gt_h,
                         0.03594771 * gt_w, 0.96405229 * gt_w]).astype(np.int32)
        crop_mask = np.zeros_like(mask)
        crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
        mask = np.logical_and(mask, crop_mask)
    elif eval_split == "cityscapes":
        mask = np.logical_and(gt_depth > min_depth, gt_depth < max_depth)
    else:
        mask = gt_depth > 0

    gt = gt_depth[mask]
    pred = pred_depth[mask] * pred_depth_scale_factor

    ratio = 1.0
    if median_scaling:
        ratio = np.median(gt) / np.median(pred)
        pred = pred * ratio
    pred = np.clip(pred, min_depth, max_depth)
    return gt, pred, ratio


def evaluate_depth_maps(pred_disps: Sequence[np.ndarray],
                        gt_depths: Sequence[np.ndarray],
                        eval_split: str = "eigen",
                        median_scaling: bool = True,
                        pred_depth_scale_factor: float = 1.0) -> dict:
    """Mean 7-metric dict over the split + median-scaling ratio stats.

    `median_scaling=False` = `--disable_median_scaling`;
    `pred_depth_scale_factor` = `--pred_depth_scale_factor` (5.4 for
    stereo-trained models, `manydepth/evaluate_depth.py:245-247`).
    """
    # DDAD evaluates to 200 m (`manydepth/trainer.py:669-670`)
    max_depth = 200.0 if eval_split == "ddad" else EVAL_MAX_DEPTH
    errors, ratios = [], []
    for pred_disp, gt in zip(pred_disps, gt_depths):
        g, p, r = prepare_gt_and_pred(
            gt, pred_disp, eval_split, max_depth=max_depth,
            median_scaling=median_scaling,
            pred_depth_scale_factor=pred_depth_scale_factor)
        errors.append(compute_depth_errors_np(g, p))
        ratios.append(r)
    mean = {k: float(np.mean([e[k] for e in errors])) for k in errors[0]}
    ratios = np.array(ratios)
    mean["med_ratio"] = float(np.median(ratios))
    mean["std_ratio"] = float(np.std(ratios / np.median(ratios)))
    return mean


def infer_disparities(model, variables, batches: Iterable[dict], cfg: Config,
                      eval_teacher: bool = False,
                      min_depth_bin=None, max_depth_bin=None,
                      mesh=None, zero_cost_volume: bool = False,
                      static_camera: bool = False,
                      post_process: bool = False) -> np.ndarray:
    """Run the jit eval forward over host batches; returns (N, H, W) scaled disps.

    With `mesh`, batches are sharded over the data axis (DP inference — the
    reference evaluates on the main process only, `manydepth/trainer.py:518`).

    Behavioral probes (SURVEY.md §4): `zero_cost_volume` zeroes the lookup
    poses (`--zero_cost_volume`, multi-frame degrades to mono);
    `static_camera` replaces every lookup frame with the current frame
    (`--static_camera`, `dualrefine/evaluate_depth.py:164-166`).
    `post_process` runs a second forward on mirrored inputs and blends
    (Monodepth-v1 flip averaging; teacher/mono only — the cost volume's
    epipolar geometry is not mirror-consistent).
    """
    if min_depth_bin is None:
        min_depth_bin = jnp.asarray(0.1)
    if max_depth_bin is None:
        max_depth_bin = jnp.asarray(10.0)
    if post_process and not eval_teacher:
        raise ValueError("post_process requires eval_teacher (flip "
                         "averaging is only defined for the mono network)")

    def forward(batch):
        if static_camera:
            color0 = batch["color"]["0"]
            batch = dict(batch, color={k: color0 for k in batch["color"]})
        out = model.apply(variables, batch, min_depth_bin, max_depth_bin,
                          method=type(model).eval_forward, mutable=False,
                          zero_cost_volume=zero_cost_volume)
        key = "mono_disp" if eval_teacher else "disp"
        scaled_disp, _ = geometry.disp_to_depth(out[key], EVAL_MIN_DEPTH,
                                                EVAL_MAX_DEPTH)
        disp = scaled_disp[..., 0]
        if post_process:
            flipped = dict(batch, color={k: v[:, :, ::-1]
                                         for k, v in batch["color"].items()})
            out_f = model.apply(variables, flipped, min_depth_bin,
                                max_depth_bin,
                                method=type(model).eval_forward,
                                mutable=False,
                                zero_cost_volume=zero_cost_volume)
            scaled_f, _ = geometry.disp_to_depth(out_f[key], EVAL_MIN_DEPTH,
                                                 EVAL_MAX_DEPTH)
            return disp, scaled_f[..., 0][:, :, ::-1]
        return disp

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        data = NamedSharding(mesh, P(mesh.axis_names[0]))
        fwd = jax.jit(forward, in_shardings=(data,),
                      out_shardings=NamedSharding(mesh, P()))

        def run(b):
            return fwd(jax.tree.map(jnp.asarray, b))
    else:
        fwd = jax.jit(forward)
        run = fwd

    if post_process:
        from mal_tpu.eval.postprocess import post_process_disparity
        pairs = [run(b) for b in batches]
        disps = [post_process_disparity(np.asarray(d), np.asarray(df))
                 for d, df in pairs]
    else:
        disps = [np.asarray(run(b)) for b in batches]
    return np.concatenate(disps, axis=0)
