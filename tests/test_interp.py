"""grid_sample / resize parity vs torch.nn.functional (the reference's ops)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mal_tpu.ops.interp import grid_sample, resize_bilinear, resize_nearest, upsample2x_nearest


def _rand_img(rng, B, H, W, C):
    return rng.uniform(-1, 2, (B, H, W, C)).astype(np.float32)


def _rand_grid(rng, B, Ho, Wo, lo=-1.3, hi=1.3):
    return rng.uniform(lo, hi, (B, Ho, Wo, 2)).astype(np.float32)


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(padding, align):
    rng = np.random.RandomState(0)
    img = _rand_img(rng, 2, 9, 13, 4)
    grid = _rand_grid(rng, 2, 7, 11)

    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  padding_mode=padding, align_corners=align))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_identity_warp():
    rng = np.random.RandomState(1)
    img = _rand_img(rng, 1, 8, 10, 3)
    ys = np.linspace(-1, 1, 8)
    xs = np.linspace(-1, 1, 10)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode="border", align_corners=True))
    np.testing.assert_allclose(out, img, atol=1e-5)


@pytest.mark.parametrize("size", [(7, 9), (24, 40), (13, 13)])
def test_resize_bilinear_matches_torch(size):
    rng = np.random.RandomState(2)
    img = _rand_img(rng, 2, 12, 20, 3)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), *size))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
                        mode="bilinear", align_corners=False
                        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("size", [(6, 10), (24, 40), (48, 160)])
def test_resize_nearest_matches_torch(size):
    rng = np.random.RandomState(3)
    img = _rand_img(rng, 2, 12, 40, 2)
    ours = np.asarray(resize_nearest(jnp.asarray(img), *size))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=size,
                        mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref)


def test_upsample2x_nearest_matches_torch():
    rng = np.random.RandomState(4)
    img = _rand_img(rng, 2, 5, 7, 3)
    ours = np.asarray(upsample2x_nearest(jnp.asarray(img)))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2),
                        scale_factor=2, mode="nearest"
                        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("padding", ["zeros", "border"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_packed_matches_torch(padding, align):
    from mal_tpu.ops.interp import grid_sample_packed
    rng = np.random.RandomState(7)
    img = _rand_img(rng, 2, 9, 13, 4)
    grid = _rand_grid(rng, 2, 7, 11, lo=-1.6, hi=1.6)  # deep OOB bands too

    ours = np.asarray(grid_sample_packed(jnp.asarray(img), jnp.asarray(grid),
                                         padding_mode=padding,
                                         align_corners=align))
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding, align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_packed_equals_reference_impl():
    from mal_tpu.ops.interp import grid_sample_reference as grid_sample, grid_sample_packed
    rng = np.random.RandomState(8)
    img = jnp.asarray(_rand_img(rng, 3, 16, 20, 8))
    grid = jnp.asarray(_rand_grid(rng, 3, 10, 14, lo=-2.0, hi=2.0))
    for pad in ("zeros", "border"):
        a = np.asarray(grid_sample(img, grid, pad, True))
        b = np.asarray(grid_sample_packed(img, grid, pad, True))
        np.testing.assert_allclose(a, b, atol=1e-5)
