"""HRNet encoder (flax.linen, NHWC).

From-scratch implementation of the HRNet-W18/32/48/64 trunk used by
DualRefine (`dualrefine/networks/hr_encoder.py`, config
`hrnet_config.py`): two stride-2 stem convs, a Bottleneck stage, then
multi-resolution branch stages with SUM-fused exchange units (1x1 conv+BN
+bilinear-upsample for up paths, 3x3 stride-2 chains for down paths).

`__call__` returns the DualRefine tap set (`depth_pose.py:193-283`):
  stem1   (B, H/2,  W/2,  64)
  stem2   (B, H/4,  W/4,  64)
  list18  4 maps at 1/4 res (stem2, stage2..4 branch-0)
  list36  3 maps at 1/8
  list72  2 maps at 1/16
  x144    1 map  at 1/32
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.models.resnet import BasicBlock, Bottleneck, _BN_EPS, _BN_MOMENTUM
from mal_tpu.ops.interp import resize_bilinear

Array = jax.Array

# stage layout shared by all widths: (num_modules, num_blocks)
_STAGES = {  # width multipliers [1, 2, 4, 8] relative to base width
    2: (1, 4),
    3: (4, 4),
    4: (3, 4),
}


def _bn(train: bool, name: str, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                        epsilon=_BN_EPS, name=name, dtype=dtype)


class _ConvBN(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = None  # compute dtype (bf16 for the TPU fast path)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = self.kernel // 2
        x = nn.Conv(self.filters, (self.kernel,) * 2, (self.stride,) * 2,
                    padding=((p, p), (p, p)), use_bias=False, name="conv",
                    dtype=self.dtype)(x)
        x = _bn(train, "bn", self.dtype)(x)
        return nn.relu(x) if self.relu else x


class _HRModule(nn.Module):
    """One exchange unit: per-branch blocks + full cross-resolution fusion."""
    channels: tuple[int, ...]
    num_blocks: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[Array], train: bool = False) -> list[Array]:
        n = len(self.channels)
        # branch blocks
        ys = []
        for i, c in enumerate(self.channels):
            y = xs[i]
            for b in range(self.num_blocks):
                y = BasicBlock(filters=c, stride=1,
                               downsample=(y.shape[-1] != c and b == 0),
                               dtype=self.dtype,
                               name=f"branch{i}_block{b}")(y, train=train)
            ys.append(y)
        if n == 1:
            return ys

        # fuse: out[i] = relu(sum_j path(ys[j] -> res i))
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    v = ys[j]
                elif j > i:  # upsample path: 1x1 conv+bn then bilinear resize
                    v = _ConvBN(self.channels[i], 1, 1, relu=False,
                                dtype=self.dtype,
                                name=f"fuse{i}_{j}")(ys[j], train=train)
                    v = resize_bilinear(v, ys[i].shape[1], ys[i].shape[2])
                else:  # downsample path: chain of 3x3 stride-2
                    v = ys[j]
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        c = self.channels[i] if last else self.channels[j]
                        v = _ConvBN(c, 3, 2, relu=not last, dtype=self.dtype,
                                    name=f"fuse{i}_{j}_{k}")(v, train=train)
                acc = v if acc is None else acc + v
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    base_width: int = 18  # 18 | 32 | 48 | 64
    # compute dtype for convs/BN (bf16 TPU fast path; taps are cast back to
    # fp32 by the caller — the DEQ solve stays fp32)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False, stem_only: bool = False,
                 stages_count: int | None = None):
        """`stages_count=B` runs the STEM on the full (e.g. concatenated 2B)
        batch but the stages/branches on the first B items only — the
        reference feeds cat([image1, image2]) through the stem so train-mode
        BatchNorm statistics pool BOTH images (`depth_pose.py:203-213`),
        then continues the HRNet stages on image1's half (`:210`)."""
        w = self.base_width
        ch2 = (w, 2 * w)
        ch3 = (w, 2 * w, 4 * w)
        ch4 = (w, 2 * w, 4 * w, 8 * w)
        # HRNet-48/64 use different stage-2+ widths; -18/-32 use w multiples.
        if w == 64:
            ch2, ch3, ch4 = ((64, 128), (64, 128, 256), (64, 128, 256, 512))

        # stem
        y = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem1")(x, train=train)
        stem1 = y
        y = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem2")(y, train=train)
        stem2 = y
        if stem_only:
            # the matching branch only needs 1/4-res stem features
            # (`depth_pose.py:203-213` runs the stem on both images, the
            # stages on image1 only)
            return {"stem1": stem1, "stem2": stem2}

        if stages_count is not None:
            y = y[:stages_count]

        # stage1: 4 Bottlenecks at 64 -> 256 channels
        z = y
        for b in range(4):
            z = Bottleneck(filters=64, stride=1, downsample=(b == 0),
                           dtype=self.dtype, name=f"layer1_{b}")(z, train=train)

        # transition1
        xs = [
            _ConvBN(ch2[0], 3, 1, dtype=self.dtype, name="trans1_0")(z, train=train),
            _ConvBN(ch2[1], 3, 2, dtype=self.dtype, name="trans1_1")(z, train=train),
        ]
        # stage2
        for m in range(_STAGES[2][0]):
            xs = _HRModule(ch2, _STAGES[2][1], dtype=self.dtype, name=f"stage2_m{m}")(xs, train=train)
        s2 = list(xs)

        # transition2: new lowest branch from the previous lowest
        xs = xs + [_ConvBN(ch3[2], 3, 2, dtype=self.dtype, name="trans2_2")(xs[-1], train=train)]
        for m in range(_STAGES[3][0]):
            xs = _HRModule(ch3, _STAGES[3][1], dtype=self.dtype, name=f"stage3_m{m}")(xs, train=train)
        s3 = list(xs)

        # transition3
        xs = xs + [_ConvBN(ch4[3], 3, 2, dtype=self.dtype, name="trans3_3")(xs[-1], train=train)]
        for m in range(_STAGES[4][0]):
            xs = _HRModule(ch4, _STAGES[4][1], dtype=self.dtype, name=f"stage4_m{m}")(xs, train=train)
        s4 = list(xs)

        taps = {
            "stem1": stem1,
            "stem2": stem2,
            "list18": [y, s2[0], s3[0], s4[0]],
            "list36": [s2[1], s3[1], s4[1]],
            "list72": [s3[2], s4[2]],
            "x144": s4[3],
        }
        return taps

    @property
    def num_ch_enc(self) -> tuple[int, ...]:
        w = self.base_width
        return (64, w, 2 * w, 4 * w, 8 * w)
