"""DynamicDepth configuration: DOMD-warped inputs + occlusion-aware cost volume.

Re-design of `dynamicdepth/trainer.py:86-905` (models-dict trainer) as one
flax module + a functional step: predict poses, run the frozen/trainable
teacher, forward-warp dynamic objects into the adjacent frames with the
teacher's depth (DOMD), then build the occlusion-aware cost volume
(`cv_min` / `cv_set_1` / `cv_pool`) over the DOMD-processed lookup frames.

Inputs additionally carry `doj_mask`, `doj_mask-1`, `doj_mask+1` (B, H, W) —
the precomputed dynamic-object masks the reference loads from .npy files.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.dynamic.cost_volume import occlusion_aware_cost_volume
from mal_tpu.dynamic.domd import domd_warp_inputs
from mal_tpu.models.depth_decoder import DepthDecoder
from mal_tpu.models.encoders import ResnetEncoder
from mal_tpu.models.resnet import ResNetFeatures, imagenet_normalize
from mal_tpu.models.pose_decoder import PoseDecoder
from mal_tpu.ops.cost_volume import (compute_depth_bins,
                                     confidence_mask_from_cost,
                                     indices_to_disparity)
from mal_tpu.ops.interp import resize_nearest

Array = jax.Array


class DynDepthModel(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        # TPU fast-training mode: bf16 conv trunks like MALModel (params
        # stay fp32; the fp32 default is the exact-parity path)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.trunk = ResNetFeatures(cfg.num_layers, 1, dtype=dtype,
                                    name="encoder")
        self.reduce_conv = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                                   dtype=dtype, name="reduce_conv")
        self.depth = DepthDecoder(dtype=dtype, name="depth")
        self.mono_encoder = ResnetEncoder(num_layers=18, dtype=dtype,
                                          name="mono_encoder")
        self.mono_depth = DepthDecoder(dtype=dtype, name="mono_depth")
        self.pose_encoder = ResnetEncoder(num_layers=18, num_input_images=2,
                                          dtype=dtype, name="pose_encoder")
        self.pose = PoseDecoder(num_frames_to_predict_for=2, dtype=dtype,
                                name="pose")

    def _pose_from_pair(self, a: Array, b: Array, train: bool):
        feats = self.pose_encoder(jnp.concatenate([a, b], -1), train=train)
        aa, t = self.pose(feats[-1])
        return aa[:, 0, 0], t[:, 0, 0]

    def __call__(self, inputs: dict, min_depth_bin, max_depth_bin, rng: Array,
                 train: bool = True, train_teacher: bool = True,
                 is_train_phase: bool = True):
        cfg = self.cfg
        aug = inputs["color_aug"]
        B, H, W, _ = aug["0"].shape
        outputs: dict[str, Array] = {}

        # --- photometric + matching poses (manydepth-style) ---
        for f_i in cfg.frame_ids[1:]:
            if f_i < 0:
                aa, t = self._pose_from_pair(aug[str(f_i)], aug["0"], train)
            else:
                aa, t = self._pose_from_pair(aug["0"], aug[str(f_i)], train)
            outputs[f"cam_T_cam/0/{f_i}"] = geometry.transformation_from_parameters(
                aa, t, invert=(f_i < 0))

        aa, t = self._pose_from_pair(aug["-1"], aug["0"], train)
        rel_m1 = geometry.transformation_from_parameters(aa, t, invert=True)
        missing = jnp.sum(jnp.abs(aug["-1"]), axis=(1, 2, 3)) == 0
        rel_m1 = jnp.where(missing[:, None, None], 0.0, rel_m1)
        rel_m1 = jax.lax.stop_gradient(rel_m1)
        outputs["relative_pose/-1"] = rel_m1

        lookup_frames = aug["-1"][:, None]  # (B, 1, H, W, 3)
        relative_poses = rel_m1[:, None]

        # --- matching augmentation ---
        if train and not cfg.no_matching_augmentation:
            r = jax.random.uniform(rng, (B,))
            static_cam = r < cfg.aug_static_camera_p
            zero_cv = (~static_cam) & (r < cfg.aug_static_camera_p
                                       + cfg.aug_zero_cost_volume_p)
            replace = inputs["color"]["0"][:, None]
            lookup_frames = jnp.where(
                static_cam[:, None, None, None, None], replace, lookup_frames)
            relative_poses = jnp.where(zero_cv[:, None, None, None], 0.0,
                                       relative_poses)
            aug_mask = (static_cam | zero_cv).astype(jnp.float32)
        else:
            aug_mask = jnp.zeros((B,), jnp.float32)
        outputs["augmentation_mask"] = aug_mask[:, None, None, None]

        # --- teacher ---
        mono_feats = self.mono_encoder(aug["0"], train=train and train_teacher)
        mono_disp = self.mono_depth(mono_feats)
        if not train_teacher:
            mono_disp = jax.lax.stop_gradient(mono_disp)
        outputs["mono_disp"] = mono_disp

        # --- DOMD warp of the adjacent frames (`trainer.py:492-537`) ---
        color_m1, color_p1 = inputs["color"]["-1"], inputs["color"]["1"]
        if "doj_mask" in inputs and not cfg.no_warp:
            color_m1, color_p1, lookup_frames = domd_warp_inputs(
                cfg, inputs, mono_disp, outputs["cam_T_cam/0/-1"],
                outputs["cam_T_cam/0/1"], aug_mask, lookup_frames,
                is_train=is_train_phase)
        outputs["domd_color/-1"] = color_m1
        outputs["domd_color/1"] = color_p1

        # --- occlusion-aware cost volume ---
        norm = imagenet_normalize(aug["0"])
        feats = self.trunk(norm, train=train, stages=2)
        cur_feats = feats[-1]
        lf = lookup_frames.reshape((-1,) + lookup_frames.shape[2:])
        lookup_feats = self.trunk(imagenet_normalize(lf), train=train,
                                  stages=2)[-1]
        lookup_feats = lookup_feats.reshape(
            (B, 1) + lookup_feats.shape[1:])
        lookup_feats = jax.lax.stop_gradient(lookup_feats)

        K2 = geometry.scale_intrinsics(inputs["K"], 2)
        inv_K2 = jnp.linalg.inv(K2)
        bins = compute_depth_bins(min_depth_bin, max_depth_bin,
                                  cfg.num_depth_bins, cfg.depth_binning)
        if (cfg.use_pallas and not cfg.cv_pool
                and jax.default_backend() == "tpu"):
            # Pallas plane-sweep with the occlusion mask as an extra warped
            # channel — the chunked grid_sample formulation was ~55% of the
            # whole step (bench_dynamic_decompose.py; the `pool` infill
            # variant needs the full-D 3-D max-pool and stays XLA)
            from mal_tpu.dynamic.cost_volume import (
                occlusion_aware_cost_volume_pallas)
            cost, missing_mask = occlusion_aware_cost_volume_pallas(
                jax.lax.stop_gradient(cur_feats), lookup_feats,
                relative_poses, K2, inv_K2, bins, lookup_frames, aug_mask,
                cv_min=cfg.cv_min, set_1=cfg.cv_set_1,
                pool_th=cfg.cv_pool_th,
                mxu_precision=cfg.cv_mxu_precision)
        else:
            cost, missing_mask = occlusion_aware_cost_volume(
                jax.lax.stop_gradient(cur_feats), lookup_feats,
                relative_poses, K2, inv_K2, bins, lookup_frames, aug_mask,
                cv_min=cfg.cv_min, set_1=cfg.cv_set_1, pool=cfg.cv_pool,
                pool_r=cfg.cv_pool_radius, pool_th=cfg.cv_pool_th,
                chunk=(16 if cfg.num_depth_bins % 16 == 0
                       else cfg.num_depth_bins))
        confidence = confidence_mask_from_cost(cost, missing_mask)
        outputs["lowest_cost"] = resize_nearest(
            indices_to_disparity(cost, bins)[..., None], H, W)[..., 0]
        outputs["consistency_mask"] = resize_nearest(
            confidence[..., None], H, W)[..., 0]

        cost = cost * confidence[:, None]
        fused = nn.relu(self.reduce_conv(jnp.concatenate(
            [cur_feats, jnp.moveaxis(cost, 1, -1)], axis=-1)))
        deep = self.trunk(fused, train=train, stages=5, start_stage=2)
        features = feats + deep
        # 1/4-res encoder feature tap for the feature-metric loss
        # (`dynamicdepth/trainer.py:594`: outputs["feat"] = features[-4])
        outputs["feat"] = features[-4]
        outputs["disp"] = self.depth(features)
        return outputs


def doj_metrics(depth_pred: Array, depth_gt: Array, doj_mask: Array,
                min_depth: float = 1e-3, max_depth: float = 80.0) -> dict:
    """Dynamic-object-restricted depth metrics
    (`dynamicdepth/trainer.py:1158-1255`): the 7 standard metrics computed
    only over GT-valid pixels inside the dynamic-object mask."""
    mask = (depth_gt > min_depth) & (depth_gt < max_depth) & (doj_mask > 0)
    pred = jnp.clip(depth_pred, min_depth, max_depth)
    n = jnp.sum(mask)

    def m(x):
        return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(n, 1)

    thresh = jnp.maximum(depth_gt / pred, pred / depth_gt)
    return {
        "doj/abs_rel": m(jnp.abs(depth_gt - pred) / jnp.maximum(depth_gt, 1e-6)),
        "doj/sq_rel": m((depth_gt - pred) ** 2 / jnp.maximum(depth_gt, 1e-6)),
        "doj/rmse": jnp.sqrt(m((depth_gt - pred) ** 2)),
        "doj/a1": m((thresh < 1.25).astype(jnp.float32)),
        "doj/a2": m((thresh < 1.25 ** 2).astype(jnp.float32)),
        "doj/a3": m((thresh < 1.25 ** 3).astype(jnp.float32)),
        "doj/count": n,
    }
