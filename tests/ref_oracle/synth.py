"""Shared synthetic-data builders for the reference-code parity oracles."""

from __future__ import annotations

import numpy as np

DRIVE = "2011_09_26/2011_09_26_drive_0002_sync"


def make_kitti_tree(root, n_images: int, raw_hw=(160, 512), seed: int = 42,
                    cam: str = "image_02"):
    """KITTI-raw style image tree + eigen test_files lines.

    Writes frames 0..n_images+1 so each eval frame f in [1, n_images] has
    both f-1 and f+1 on disk. Returns (data_path, filenames)."""
    from PIL import Image

    data = root / "data"
    img_dir = data / DRIVE / cam / "data"
    img_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    for f in range(n_images + 2):
        arr = rng.randint(0, 255, size=(*raw_hw, 3), dtype=np.uint8)
        arr = (arr.astype(np.float32) + np.roll(arr, 1, 0)
               + np.roll(arr, 1, 1) + np.roll(arr, 2, 1)) / 4.0
        Image.fromarray(arr.astype(np.uint8)).save(
            img_dir / f"{f:010d}.jpg", quality=95)
    files = [f"{DRIVE} {f} l" for f in range(1, 1 + n_images)]
    return str(data), files


def write_split(root, split: str, files, gts=None):
    """splits/<split>/test_files.txt (+ optional gt_depths.npz)."""
    split_dir = root / "splits" / split
    split_dir.mkdir(parents=True, exist_ok=True)
    (split_dir / "test_files.txt").write_text("\n".join(files) + "\n")
    if gts is not None:
        arr = np.empty(len(gts), dtype=object)
        for i, g in enumerate(gts):
            arr[i] = g
        np.savez_compressed(split_dir / "gt_depths.npz", data=arr)
    return split_dir


def make_gt_depths(n: int, shape=(144, 480), seed: int = 3):
    rng = np.random.RandomState(seed)
    gts = []
    for _ in range(n):
        g = rng.uniform(0.5, 70.0, size=shape).astype(np.float32)
        g[rng.rand(*shape) < 0.1] = 0.0
        gts.append(g)
    return gts
