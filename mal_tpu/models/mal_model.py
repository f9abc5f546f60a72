"""The composed MAL multi-frame depth model (flax.linen).

TPU-native re-design of `manydepth/networks/repdepth.py:23-338` (`RepDepth`):
owns the six sub-nets (matching encoder, depth decoder, mono encoder/decoder,
pose encoder/decoder), predicts photometric + gradient-free matching poses,
applies the per-sample matching augmentations via explicit PRNG keys (the
reference uses host `random.random()` per item, `repdepth.py:279-293`), and
runs the teacher and the cost-volume student paths.

Batch format (all NHWC):
  inputs = {
    "color":     {str(f): (B, H, W, 3)},   # non-augmented frames
    "color_aug": {str(f): (B, H, W, 3)},
    "K":         (B, 4, 4),                # full-resolution intrinsics
    "inv_K":     (B, 4, 4),
  }
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu import geometry
from mal_tpu.config import Config
from mal_tpu.models.depth_decoder import DepthDecoder
from mal_tpu.models.encoders import ResnetEncoder, ResnetEncoderMatching
from mal_tpu.models.pose_decoder import PoseCNN, PoseDecoder
from mal_tpu.ops.interp import resize_nearest

Array = jax.Array


class MALModel(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        # --set remat=true: jax.checkpoint the encoder trunks — the backward
        # recomputes their activations instead of storing them (peak-HBM
        # knob; numerically exact, ~cost of a second forward over the
        # trunks). Param trees are unchanged (lifted transform).
        MatchEnc, Enc = ResnetEncoderMatching, ResnetEncoder
        if cfg.remat:
            MatchEnc = nn.remat(ResnetEncoderMatching, static_argnums=(8,))
            Enc = nn.remat(ResnetEncoder, static_argnums=(2,))
        self.encoder = MatchEnc(
            num_layers=cfg.num_layers,
            num_depth_bins=cfg.num_depth_bins,
            depth_binning=cfg.depth_binning,
            adaptive_bins=cfg.adaptive_bins,
            use_pallas=cfg.use_pallas,
            cv_mxu_precision=cfg.cv_mxu_precision,
            num_depth_shards=cfg.num_depth_shards,
            dtype=dtype,
            name="encoder",
        )
        self.depth = DepthDecoder(dtype=dtype, name="depth")
        self.mono_encoder = Enc(num_layers=18, dtype=dtype,
                                name="mono_encoder")
        self.mono_depth = DepthDecoder(dtype=dtype, name="mono_depth")
        if cfg.pose_cnn:
            # pair-input PoseCNN (the reference's pose_cnn branch is vestigial
            # — `repdepth.py:49-54` builds it but the matching predict path is
            # commented out; here it is a working drop-in for the pair API)
            self.pose_encoder = PoseCNN(num_input_frames=2, name="pose_encoder")
            self.pose = None
        else:
            self.pose_encoder = Enc(num_layers=18, num_input_images=2,
                                    dtype=dtype, name="pose_encoder")
            self.pose = PoseDecoder(num_frames_to_predict_for=2, dtype=dtype,
                                    name="pose")

    # ------------------------------------------------------------------
    def _pose_from_pair(self, img_a: Array, img_b: Array, train: bool):
        """Axis-angle + translation from a temporally-ordered frame pair."""
        stacked = jnp.concatenate([img_a, img_b], axis=-1)
        if self.cfg.pose_cnn:
            axisangle, translation = self.pose_encoder(stacked)
        else:
            feats = self.pose_encoder(stacked, train)
            axisangle, translation = self.pose(feats[-1])
        return axisangle[:, 0, 0], translation[:, 0, 0]  # (B, 3) each

    def predict_poses(self, inputs: dict, train: bool) -> dict:
        """Photometric-loss poses + gradient-free matching poses.

        Reference: `repdepth.py:141-227`.
        """
        cfg = self.cfg
        outputs: dict[str, Array] = {}
        aug = inputs["color_aug"]

        for f_i in cfg.frame_ids[1:]:
            if f_i < 0:
                aa, t = self._pose_from_pair(aug[str(f_i)], aug["0"], train)
            else:
                aa, t = self._pose_from_pair(aug["0"], aug[str(f_i)], train)
            outputs[f"cam_T_cam/0/{f_i}"] = geometry.transformation_from_parameters(
                aa, t, invert=(f_i < 0))
            if cfg.temporal or cfg.main_temporal:
                # adjacent->current transforms for the temporal hint
                # (`repdepth.py:163-171`)
                outputs[f"cam_T_cam/{f_i}/0"] = geometry.transformation_from_parameters(
                    aa, t, invert=(f_i >= 0))

        # matching poses: chained, gradient-free (`repdepth.py:176-226`)
        rel_pose: dict[int, Array] = {}
        for fi in cfg.matching_ids[1:]:
            if fi < 0:
                aa, t = self._pose_from_pair(aug[str(fi)], aug[str(fi + 1)], train)
                pose = geometry.transformation_from_parameters(aa, t, invert=True)
                if fi != -1:
                    pose = pose @ rel_pose[fi + 1]
            else:
                aa, t = self._pose_from_pair(aug[str(fi - 1)], aug[str(fi)], train)
                pose = geometry.transformation_from_parameters(aa, t, invert=False)
                if fi != 1:
                    pose = pose @ rel_pose[fi - 1]
            # zero pose marks a missing frame (all-black dummy image)
            missing = jnp.sum(jnp.abs(aug[str(fi)]), axis=(1, 2, 3)) == 0
            pose = jnp.where(missing[:, None, None], 0.0, pose)
            rel_pose[fi] = jax.lax.stop_gradient(pose)

        for fi, pose in rel_pose.items():
            outputs[f"relative_pose/{fi}"] = pose
        return outputs

    # ------------------------------------------------------------------
    def __call__(self, inputs: dict, min_depth_bin, max_depth_bin,
                 rng: Array, train: bool = True, train_teacher: bool = True,
                 train_pose: bool = True):
        cfg = self.cfg
        aug = inputs["color_aug"]
        B = aug["0"].shape[0]

        pose_outputs = self.predict_poses(inputs, train and train_teacher and train_pose)
        if not (train_teacher and train_pose):
            pose_outputs = jax.tree.map(jax.lax.stop_gradient, pose_outputs)
        outputs = dict(pose_outputs)

        relative_poses = jnp.stack(
            [outputs[f"relative_pose/{fi}"] for fi in cfg.matching_ids[1:]], 1)
        lookup_frames = jnp.stack(
            [aug[str(fi)] for fi in cfg.matching_ids[1:]], 1)  # (B, F, H, W, 3)

        # --- matching augmentation (`repdepth.py:277-295`) ---
        if train and not cfg.no_matching_augmentation:
            r = jax.random.uniform(rng, (B,))
            static_cam = r < cfg.aug_static_camera_p
            zero_cv = (~static_cam) & (r < cfg.aug_static_camera_p
                                       + cfg.aug_zero_cost_volume_p)
            replace = jnp.broadcast_to(inputs["color"]["0"][:, None],
                                       lookup_frames.shape)
            lookup_frames = jnp.where(
                static_cam[:, None, None, None, None], replace, lookup_frames)
            relative_poses = jnp.where(
                zero_cv[:, None, None, None], 0.0, relative_poses)
            aug_mask = (static_cam | zero_cv).astype(jnp.float32)
        else:
            aug_mask = jnp.zeros((B,), jnp.float32)
        outputs["augmentation_mask"] = aug_mask[:, None, None, None]

        # --- teacher (mono) path ---
        mono_feats = self.mono_encoder(aug["0"], train and train_teacher)
        mono_disp = self.mono_depth(mono_feats)
        if not train_teacher:
            mono_disp = jax.lax.stop_gradient(mono_disp)
        outputs["mono_disp"] = mono_disp

        # --- student (multi-frame cost volume) path ---
        K2 = geometry.scale_intrinsics(inputs["K"], 2)
        inv_K2 = jnp.linalg.inv(K2)
        features, lowest_cost, confidence_mask = self.encoder(
            aug["0"], lookup_frames, relative_poses, K2, inv_K2,
            min_depth_bin, max_depth_bin, train)
        outputs["disp"] = self.depth(features)

        H, W = cfg.height, cfg.width
        outputs["lowest_cost"] = resize_nearest(
            lowest_cost[..., None], H, W)[..., 0]
        outputs["consistency_mask"] = resize_nearest(
            confidence_mask[..., None], H, W)[..., 0]
        return outputs

    # ------------------------------------------------------------------
    def eval_forward(self, inputs: dict, min_depth_bin, max_depth_bin,
                     zero_cost_volume: bool = False):
        """Inference path mirroring `manydepth/evaluate_depth.py:96-167`:
        chain matching poses over the lookup frames, run the cost-volume
        encoder + decoder, and the teacher for `eval_teacher`."""
        cfg = self.cfg
        color = inputs["color"]

        rel_pose: dict[int, Array] = {}
        lookup_ids = [f for f in cfg.matching_ids[1:]]
        for fi in sorted(lookup_ids, reverse=True):  # -1, -2, ...
            if fi < 0:
                aa, t = self._pose_from_pair(color[str(fi)], color[str(fi + 1)],
                                             train=False)
                pose = geometry.transformation_from_parameters(aa, t, invert=True)
                if fi != -1:
                    pose = pose @ rel_pose[fi + 1]
            else:
                aa, t = self._pose_from_pair(color[str(fi - 1)], color[str(fi)],
                                             train=False)
                pose = geometry.transformation_from_parameters(aa, t, invert=False)
                if fi != 1:
                    pose = pose @ rel_pose[fi - 1]
            rel_pose[fi] = pose

        lookup_frames = jnp.stack([color[str(f)] for f in lookup_ids], 1)
        poses = jnp.stack([rel_pose[f] for f in lookup_ids], 1)
        if zero_cost_volume:
            poses = poses * 0.0

        K2 = geometry.scale_intrinsics(inputs["K"], 2)
        inv_K2 = jnp.linalg.inv(K2)
        features, lowest_cost, confidence = self.encoder(
            color["0"], lookup_frames, poses, K2, inv_K2,
            min_depth_bin, max_depth_bin, False)
        disp = self.depth(features)

        mono_feats = self.mono_encoder(color["0"], False)
        mono_disp = self.mono_depth(mono_feats)
        return {"disp": disp, "mono_disp": mono_disp,
                "lowest_cost": lowest_cost, "consistency_mask": confidence}
