"""SSIM parity vs a torch oracle built exactly like the reference
(`manydepth/layers.py:226-257`)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mal_tpu.ops.ssim import ssim


def torch_ssim(x: torch.Tensor, y: torch.Tensor) -> torch.Tensor:
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    pad = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = pad(x), pad(y)
    mu_x, mu_y = pool(x), pool(y)
    sigma_x = pool(x ** 2) - mu_x ** 2
    sigma_y = pool(y ** 2) - mu_y ** 2
    sigma_xy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x ** 2 + mu_y ** 2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(y).permute(0, 3, 1, 2)
                     ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_images_zero():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    out = np.asarray(ssim(x, x))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
