"""Monodepth2-style U-Net depth decoder (flax.linen, NHWC).

Reference: `manydepth/networks/depth_decoder.py:16-68` — five up-conv stages
(reflect-padded 3x3 conv + ELU), nearest x2 upsampling, encoder skips, a
single full-resolution sigmoid disparity head (the reference's multi-scale
heads are commented out; only ("disp", 0) ships).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mal_tpu.ops.interp import upsample2x_nearest

Array = jax.Array


class ConvBlock(nn.Module):
    """Reflect-pad 3x3 conv + ELU (`manydepth/layers.py:103-135`)."""
    filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.filters, (3, 3), padding="VALID", name="conv",
                    dtype=self.dtype)(x)
        return nn.elu(x)


class Conv3x3Reflect(nn.Module):
    filters: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.filters, (3, 3), padding="VALID", name="conv",
                       dtype=self.dtype)(x)


class DepthDecoder(nn.Module):
    """5-stage decoder over an encoder pyramid; returns full-res disparity."""
    num_ch_dec: tuple[int, ...] = (16, 32, 64, 128, 256)
    use_skips: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, input_features: list[Array]) -> Array:
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_0",
                          dtype=self.dtype)(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate(
                    [x, input_features[i - 1].astype(x.dtype)], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_1",
                          dtype=self.dtype)(x)
        disp = Conv3x3Reflect(1, name="dispconv_0", dtype=self.dtype)(x)
        # sigmoid + everything downstream (geometry) in fp32
        return nn.sigmoid(disp.astype(jnp.float32))  # (B, H, W, 1)
