"""Depth encoders (flax.linen, NHWC).

`ResnetEncoder` — the plain 5-scale pyramid encoder (teacher / pose trunk),
`manydepth/networks/resnet_encoder.py:356-398`.

`ResnetEncoderMatching` — the multi-frame cost-volume encoder,
`manydepth/networks/resnet_encoder.py:71-329`, re-designed TPU-first: the
plane-sweep is the fully-batched `plane_sweep_cost_volume` op (no per-item
Python loops), lookup-feature extraction and the volume are `stop_gradient`ed
exactly as the reference's `torch.no_grad()` blocks.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.cost_volume import (
    compute_depth_bins,
    confidence_mask_from_cost,
    indices_to_disparity,
    plane_sweep_cost_volume,
)
from mal_tpu.models.resnet import ResNetFeatures, imagenet_normalize

Array = jax.Array


class ResnetEncoder(nn.Module):
    """Plain ResNet pyramid encoder with input normalization."""
    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = None

    def setup(self):
        self.trunk = ResNetFeatures(self.num_layers, self.num_input_images,
                                    dtype=self.dtype, name="encoder")

    def __call__(self, image: Array, train: bool = False) -> list[Array]:
        return self.trunk(imagenet_normalize(image), train=train)

    @property
    def num_ch_enc(self):
        return ResNetFeatures(self.num_layers).num_ch_enc


class ResnetEncoderDYJ(nn.Module):
    """Multi-frame stacked pose encoder with a built-in conv pose head
    (`manydepth/networks/resnet_encoder.py:400-476`, the `pose_attn` eval
    path at `trainer.py:899-917`).

    Frames stack channel-major (the reference's einops
    'b c t h w -> b (c t) h w', `:446`), i.e. [R_t0..R_tN, G_t0.., B_t0..],
    and the head emits (num_input_images - 1) 6-DoF outputs.

    The reference's forward returns the pairs spread as a 4-tuple that its
    call sites slice inconsistently (`trainer.py:903,916` apply [..., :3] to
    a (B, 3) tensor); the evident intent — "take the k-th 6-DoF output" — is
    what `__call__` returns: (axisangle, translation) with shape
    (B, num_input_images-1, 3) each.
    """
    num_layers: int = 18
    num_input_images: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, frames: Array, train: bool = False):
        """frames: (B, T, H, W, 3) temporally ordered."""
        B, T, H, W, C = frames.shape
        assert T == self.num_input_images
        x = jnp.moveaxis(frames, 1, -1)          # (B, H, W, 3, T)
        x = x.reshape(B, H, W, C * T)            # (c t) channel-major order
        feats = ResNetFeatures(self.num_layers, T, dtype=self.dtype,
                               name="encoder")(imagenet_normalize(x),
                                               train=train)
        out = nn.relu(nn.Conv(256, (1, 1), name="squeeze")(feats[-1]))
        out = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                              name="pose_0")(out))
        out = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                              name="pose_1")(out))
        out = nn.Conv(6 * (T - 1), (1, 1), name="pose_2")(out)
        out = 0.01 * jnp.mean(out, axis=(1, 2)).reshape(B, T - 1, 6)
        return out[..., :3], out[..., 3:]


class ResnetEncoderMatching(nn.Module):
    """ResNet encoder with a plane-sweep cost volume after stage 2.

    __call__(current_image, lookup_images, poses, K, invK, min/max depth bin)
    -> (features list, lowest_cost disparity (B,h,w), confidence mask (B,h,w)).

    K/invK must already be at the 1/4 matching scale (the reference consumes
    ("K", 2), `repdepth.py:323-324`).
    """
    num_layers: int = 18
    num_depth_bins: int = 96
    depth_binning: str = "linear"
    adaptive_bins: bool = True
    cv_chunk: int = 16
    use_pallas: bool = True  # Pallas plane-sweep kernel on TPU (3.9x faster)
    cv_mxu_precision: str = "highest"
    # >1: shard the depth-plane axis over a "depth" mesh axis (single-chunk
    # XLA path; GSPMD splits the volume so each device holds D/n planes)
    num_depth_shards: int = 1
    dtype: Any = None

    def setup(self):
        self.trunk = ResNetFeatures(self.num_layers, 1, dtype=self.dtype,
                                    name="encoder")
        width = 256 if self.num_layers in (50, 101, 152) else 64
        self.reduce_conv = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                                   dtype=self.dtype, name="reduce_conv")

    def feature_extraction(self, image: Array, train: bool = False) -> list[Array]:
        """First two ResNet stages (`resnet_encoder.py:235-245`)."""
        return self.trunk(imagenet_normalize(image), train=train, stages=2)

    def __call__(self, current_image: Array, lookup_images: Array,
                 poses: Array, K: Array, invK: Array,
                 min_depth_bin: Array, max_depth_bin: Array,
                 train: bool = False):
        B, H, W, _ = current_image.shape
        F = lookup_images.shape[1]

        feats = self.feature_extraction(current_image, train=train)
        cur_feats = feats[-1].astype(jnp.float32)  # (B, h, w, 64) at 1/4

        # lookup features + cost volume: constant w.r.t. params
        # (reference computes them under no_grad, `resnet_encoder.py:292-305`)
        lookup_flat = lookup_images.reshape((B * F,) + lookup_images.shape[2:])
        lookup_feats = self.feature_extraction(lookup_flat, train=train)[-1]
        lookup_feats = lookup_feats.reshape((B, F) + lookup_feats.shape[1:])
        lookup_feats = jax.lax.stop_gradient(lookup_feats.astype(jnp.float32))

        depth_bins = compute_depth_bins(min_depth_bin, max_depth_bin,
                                        self.num_depth_bins, self.depth_binning)
        if self.num_depth_shards > 1:
            # depth-plane sharding: single-chunk XLA path with in-model
            # sharding constraints (the Pallas kernel is per-device)
            cost_volume, missing_mask = plane_sweep_cost_volume(
                jax.lax.stop_gradient(cur_feats), lookup_feats, poses, K,
                invK, depth_bins, chunk=self.num_depth_bins)
        elif self.use_pallas and jax.default_backend() == "tpu":
            from mal_tpu.ops.pallas.cost_volume_kernel import (
                plane_sweep_cost_volume_pallas)
            cost_volume, missing_mask = plane_sweep_cost_volume_pallas(
                jax.lax.stop_gradient(cur_feats), lookup_feats, poses, K,
                invK, depth_bins, mxu_precision=self.cv_mxu_precision)
        else:
            cost_volume, missing_mask = plane_sweep_cost_volume(
                jax.lax.stop_gradient(cur_feats), lookup_feats, poses, K, invK,
                depth_bins, chunk=self.cv_chunk)
        confidence = confidence_mask_from_cost(cost_volume, missing_mask)
        lowest_cost = indices_to_disparity(cost_volume, depth_bins)

        cost_volume = cost_volume * confidence[:, None]

        # fuse [feats ‖ cost] back to the trunk width, then run stages 3-5
        # (`resnet_encoder.py:115-119,320-325`); cost moves to channel-last.
        cost_nhwc = jnp.moveaxis(cost_volume, 1, -1)  # (B, h, w, D)
        fused = nn.relu(self.reduce_conv(
            jnp.concatenate([cur_feats, cost_nhwc], axis=-1)))

        deep = self.trunk(fused, train=train, stages=5, start_stage=2)
        features = feats + deep
        return features, lowest_cost, confidence

    @property
    def num_ch_enc(self):
        return ResNetFeatures(self.num_layers).num_ch_enc
