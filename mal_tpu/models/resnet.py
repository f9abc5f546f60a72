"""ResNet feature pyramid (flax.linen, NHWC).

From-scratch JAX implementation of the torchvision-style ResNet used by every
encoder in the reference (`manydepth/networks/resnet_encoder.py:25-68,356-398`):
5-scale feature pyramid [1/2, 1/4, 1/8, 1/16, 1/32], multi-image first conv for
the pose encoder, BatchNorm with torch momentum/eps, explicit torch-style
padding so converted checkpoints are bit-comparable.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

_BN_MOMENTUM = 0.9   # torch momentum 0.1 -> flax momentum 0.9
_BN_EPS = 1e-5


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None  # compute dtype (bf16 for the TPU fast path)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, name="bn2", dtype=self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.filters, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv",
                               dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                                    name="downsample_bn",
                                    dtype=self.dtype)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output channels = 4 * filters
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1", dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, name="bn2", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, name="conv3", dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                         epsilon=_BN_EPS, name="bn3", dtype=self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv", dtype=self.dtype)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                                    name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(y + identity)


_LAYOUTS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
            101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_BOTTLENECK = {50, 101, 152}


def _max_pool_3x3s2p1(x: Array) -> Array:
    """torch MaxPool2d(3, stride=2, padding=1) with -inf padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1), padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNetFeatures(nn.Module):
    """ResNet trunk returning the 5-scale feature pyramid.

    num_input_images > 1 stacks frames along channels for the pose encoder
    (`resnet_encoder.py:25-68`). `stages` limits how deep to run (the
    cost-volume encoder only needs the first two stages for matching).
    """
    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 stages: int = 5, start_stage: int = 0) -> list[Array]:
        """Run the trunk from `start_stage` until `stages` feature maps exist.

        start_stage=0: x is an image; returns [f0(1/2), f1(1/4), ...].
        start_stage=2: x is a 1/4-res stage-2-width map (the cost-volume
        fusion point); returns [f2(1/8), f3(1/16), f4(1/32)].
        """
        layout = _LAYOUTS[self.num_layers]
        bottleneck = self.num_layers in _BOTTLENECK
        block_cls = Bottleneck if bottleneck else BasicBlock
        widths = (64, 128, 256, 512)
        expansion = 4 if bottleneck else 1

        feats: list[Array] = []
        y = x
        if start_stage == 0:
            if self.dtype is not None:
                y = y.astype(self.dtype)
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, name="conv1", dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=_BN_MOMENTUM, epsilon=_BN_EPS,
                             name="bn1", dtype=self.dtype)(y)
            y = nn.relu(y)
            feats.append(y)  # 1/2
            if stages == 1:
                return feats
            y = _max_pool_3x3s2p1(y)

        first_layer = max(start_stage - 1, 0)  # layer index 0..3
        for stage_idx in range(first_layer, 4):
            if start_stage == 0 and stages <= stage_idx + 1:
                return feats
            width = widths[stage_idx]
            stride = 1 if stage_idx == 0 else 2
            in_ch = 64 if stage_idx == 0 else widths[stage_idx - 1] * expansion
            out_ch = width * expansion
            for b in range(layout[stage_idx]):
                y = block_cls(
                    filters=width,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0 and (stride != 1 or in_ch != out_ch)),
                    name=f"layer{stage_idx + 1}_{b}",
                    dtype=self.dtype,
                )(y, train=train)
            feats.append(y)  # 1/4, 1/8, 1/16, 1/32
        return feats

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        if self.num_layers in _BOTTLENECK:
            return (64, 256, 512, 1024, 2048)
        return (64, 64, 128, 256, 512)


def imagenet_normalize(img: Array) -> Array:
    """The reference's input normalization (`resnet_encoder.py:238`)."""
    return (img - 0.45) / 0.225
