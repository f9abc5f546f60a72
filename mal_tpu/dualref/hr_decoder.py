"""HR depth decoder with channel-attention fusion (DIFFNet-style).

Reference: `dualrefine/networks/hr_depth_decoder.py` + the `Attention_Module`
/ `ChannelAttention` blocks in `dualrefine/layers.py:305-475`. The DualRefine
trunk taps it mid-way (`depth_pose.py:257-283`), so `__call__` also returns
the intermediate maps (x36, relu_x18 pre/post, x9, x6).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.models.depth_decoder import ConvBlock, Conv3x3Reflect
from mal_tpu.ops.interp import upsample2x_nearest

Array = jax.Array


class ChannelAttention(nn.Module):
    """SE block: global-avg-pool -> 2-layer MLP (reduction 16) -> sigmoid scale."""
    ratio: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = nn.Dense(max(c // self.ratio, 1), use_bias=False, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=False, name="fc2")(s)
        return nn.sigmoid(s)[:, None, None, :] * x


class AttentionModule(nn.Module):
    """Upsample high-res input x2, concat low-res skips, SE, 3x3 conv."""
    out_channels: int

    @nn.compact
    def __call__(self, high: Array, lows: list[Array],
                 relu: bool = True) -> Array:
        feats = [upsample2x_nearest(high)] + list(lows)
        feats = jnp.concatenate(feats, axis=-1)
        feats = ChannelAttention(name="ca")(feats)
        out = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                      name="conv_se")(feats)
        return nn.relu(out) if relu else out


class HRDepthDecoder(nn.Module):
    """4-scale sigmoid disparity decoder over the HRNet tap pyramid."""
    num_ch_dec: tuple[int, ...] = (16, 32, 64, 128, 256)

    def setup(self):
        self.att72 = AttentionModule(256, name="att72")
        self.att36 = AttentionModule(128, name="att36")
        self.att18 = AttentionModule(64, name="att18")
        self.att9 = AttentionModule(32, name="att9")
        self.up_x9_0 = ConvBlock(self.num_ch_dec[0], name="up_x9_0")
        self.up_x9_1 = ConvBlock(self.num_ch_dec[0], name="up_x9_1")
        self.disp0 = Conv3x3Reflect(1, name="dispConvScale0")
        self.disp1 = Conv3x3Reflect(1, name="dispConvScale1")
        self.disp2 = Conv3x3Reflect(1, name="dispConvScale2")
        self.disp3 = Conv3x3Reflect(1, name="dispConvScale3")

    def __call__(self, taps: dict):
        """taps from `HRNet.__call__`. Returns (disps dict, intermediates)."""
        x72 = self.att72(taps["x144"], taps["list72"])
        x36 = self.att36(x72, taps["list36"])
        x18 = self.att18(x36, taps["list18"], relu=False)  # pre-relu tap
        relu_x18 = nn.relu(x18)
        x9 = self.att9(relu_x18, [taps["stem1"]])
        x6 = self.up_x9_1(upsample2x_nearest(self.up_x9_0(x9)))

        disps = {
            0: nn.sigmoid(self.disp0(x6)),
            1: nn.sigmoid(self.disp1(x9)),
            2: nn.sigmoid(self.disp2(relu_x18)),
            3: nn.sigmoid(self.disp3(x36)),
        }
        inter = {"x36": x36, "x18": x18, "relu_x18": relu_x18,
                 "x9": x9, "x6": x6}
        return disps, inter
