"""ctypes bindings for the native IO runtime (native/malio.cpp).

Builds `libmalio.so` on first use if the toolchain is available; every entry
point has a pure-Python (PIL/numpy) fallback so the package works without a
compiler. The batch loader decodes+resizes straight into one contiguous
float32 NHWC buffer with a C++ thread pool — the TPU-native replacement for
the reference's torch DataLoader worker processes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmalio.so"))


@lru_cache(maxsize=1)
def _load_lib():
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.malio_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.malio_load_image.restype = ctypes.c_int
    lib.malio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.malio_load_batch.restype = ctypes.c_int
    lib.malio_velodyne_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.malio_velodyne_depth.restype = None
    return lib


def available() -> bool:
    return _load_lib() is not None


def load_image(path: str, width: int, height: int,
               flip: bool = False) -> np.ndarray:
    """Decode + Lanczos-resize one image -> (H, W, 3) float32 in [0,1]."""
    lib = _load_lib()
    if lib is None:
        return _load_image_pil(path, width, height, flip)
    out = np.empty((height, width, 3), np.float32)
    rc = lib.malio_load_image(
        path.encode(), width, height, int(flip),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise FileNotFoundError(path)
    return out


def load_batch(paths: list[str], width: int, height: int,
               flips: list[bool] | None = None,
               num_threads: int = 8) -> np.ndarray:
    """Threaded batched decode -> (N, H, W, 3) float32."""
    lib = _load_lib()
    if flips is None:
        flips = [False] * len(paths)
    if lib is None:
        return np.stack([_load_image_pil(p, width, height, f)
                         for p, f in zip(paths, flips)])
    n = len(paths)
    out = np.empty((n, height, width, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fl = (ctypes.c_int * n)(*[int(f) for f in flips])
    rc = lib.malio_load_batch(
        arr, fl, n, width, height, num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise FileNotFoundError(f"{rc} of {n} images failed to load")
    return out


def velodyne_depth(points: np.ndarray, P: np.ndarray, height: int,
                   width: int) -> np.ndarray:
    """points: (N, 4) float32 homogeneous velodyne points; P: (3, 4)."""
    lib = _load_lib()
    points = np.ascontiguousarray(points, np.float32)
    P = np.ascontiguousarray(P, np.float32)
    if lib is None:
        from mal_tpu.data import kitti as _k
        raise RuntimeError("native lib unavailable; use "
                           "mal_tpu.data.kitti.generate_depth_map")
    out = np.zeros((height, width), np.float32)
    lib.malio_velodyne_depth(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(points),
        P.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def _load_image_pil(path: str, width: int, height: int,
                    flip: bool) -> np.ndarray:
    from PIL import Image

    from mal_tpu.data.mono_dataset import _ANTIALIAS, pil_loader

    img = pil_loader(path)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    img = img.resize((width, height), _ANTIALIAS)
    return np.asarray(img, np.float32) / 255.0
