"""Native IO runtime tests: build, decode/resize parity vs PIL, velodyne."""

import os

import numpy as np
import pytest
from PIL import Image

from mal_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
    # smooth it so JPEG artifacts stay small
    arr = np.asarray(Image.fromarray(arr).resize((64, 48))).astype(np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "test.jpg"
    Image.fromarray(arr).save(p, quality=95)
    return str(p)


@pytest.fixture(scope="module")
def png_file(tmp_path_factory):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (40, 56, 3), np.uint8)
    p = tmp_path_factory.mktemp("imgs") / "test.png"
    Image.fromarray(arr).save(p)
    return str(p)


def test_native_lib_builds():
    assert native.available(), "libmalio.so failed to build"


def test_decode_resize_matches_pil(jpeg_file, png_file):
    for path in (jpeg_file, png_file):
        ours = native.load_image(path, 32, 24)
        ref = native._load_image_pil(path, 32, 24, False)
        # PIL and our Lanczos agree to within 1/255 rounding
        assert np.abs(ours - ref).max() <= (1.5 / 255.0), path


def test_flip(png_file):
    ours = native.load_image(png_file, 28, 20, flip=True)
    ref = native._load_image_pil(png_file, 28, 20, True)
    assert np.abs(ours - ref).max() <= (1.5 / 255.0)


def test_load_batch(png_file, jpeg_file):
    out = native.load_batch([png_file, jpeg_file, png_file], 32, 24,
                            num_threads=2)
    assert out.shape == (3, 24, 32, 3)
    single = native.load_image(png_file, 32, 24)
    np.testing.assert_allclose(out[0], single)
    np.testing.assert_allclose(out[2], single)


def test_velodyne_depth_matches_numpy_reference():
    """Compare against the numpy projector on synthetic points."""
    rng = np.random.RandomState(2)
    n = 500
    pts = np.ones((n, 4), np.float32)
    pts[:, 0] = rng.uniform(1, 40, n)      # forward
    pts[:, 1] = rng.uniform(-10, 10, n)
    pts[:, 2] = rng.uniform(-2, 2, n)
    # simple projection: camera looking down +x
    P = np.array([[0, -100, 0, 160.0],
                  [0, 0, -100, 60.0],
                  [1, 0, 0, 0]], np.float32)
    H, W = 120, 320
    out = native.velodyne_depth(pts, P, H, W)
    assert out.shape == (H, W)
    assert (out >= 0).all()

    # numpy oracle with the same rounding/dedupe rules
    ref = np.zeros((H, W), np.float32)
    cam = (P @ pts.T).T
    for x, y, z in cam:
        if z <= 0:
            continue
        u = int(np.round(x / z)) - 1
        v = int(np.round(y / z)) - 1
        if 0 <= u < W and 0 <= v < H:
            if ref[v, u] == 0 or z < ref[v, u]:
                ref[v, u] = z
    np.testing.assert_allclose(out, ref, rtol=1e-5)
