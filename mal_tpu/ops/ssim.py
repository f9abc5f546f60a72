"""SSIM dissimilarity (pure JAX, NHWC).

Matches the reference implementation (`manydepth/layers.py:226-257`):
reflection pad 1, 3x3 average pooling for all moments, C1=0.01^2, C2=0.03^2,
output clamped to [0, 1] as (1 - SSIM)/2.

XLA fuses the pad + five pooling windows + elementwise math into a couple of
fused loops on the VPU; no Pallas needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _avg_pool3(x: Array) -> Array:
    """3x3 stride-1 average pool, VALID (input already padded)."""
    s = lax.reduce_window(
        x, 0.0, lax.add, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1), padding="VALID",
    )
    return s / 9.0


def _reflect_pad1(x: Array) -> Array:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


@jax.jit
def ssim(x: Array, y: Array) -> Array:
    """SSIM dissimilarity map, same shape as inputs (B, H, W, C)."""
    x = _reflect_pad1(x)
    y = _reflect_pad1(y)

    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)

    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)

    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)
