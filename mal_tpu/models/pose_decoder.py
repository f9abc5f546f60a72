"""Pose heads (flax.linen, NHWC).

`PoseDecoder` mirrors `manydepth/networks/pose_decoder.py:12-52` (squeeze 1x1
conv + 3 pose convs + global mean + 0.01 scale); `PoseCNN` mirrors
`manydepth/networks/pose_cnn.py:10-47`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class PoseDecoder(nn.Module):
    """Predicts (axisangle, translation) for `num_frames_to_predict_for` frames.

    Input: the last ResNet feature map (B, H/32, W/32, 512).
    Output: axisangle, translation, each (B, num_frames, 1, 3) in fp32
    (pose/geometry math must stay fp32).
    """
    num_frames_to_predict_for: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, last_feature: Array):
        y = nn.relu(nn.Conv(256, (1, 1), name="squeeze", dtype=self.dtype)(last_feature))
        y = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="pose_0", dtype=self.dtype)(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), name="pose_1", dtype=self.dtype)(y))
        y = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), name="pose_2", dtype=self.dtype)(y)
        y = jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # (B, 6*nf) fp32
        y = 0.01 * y.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return y[..., :3], y[..., 3:]


class PoseCNN(nn.Module):
    """Standalone pose CNN over stacked frames (B, H, W, 3*num_input_frames)."""
    num_input_frames: int = 3

    @nn.compact
    def __call__(self, x: Array):
        specs = [(16, 7, 2, 3), (32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1),
                 (256, 3, 2, 1), (256, 3, 2, 1), (256, 3, 2, 1)]
        for i, (ch, k, s, p) in enumerate(specs):
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1), name="pose_conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
