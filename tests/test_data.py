"""Dataset / loader / checkpoint tests with synthetic on-disk data."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mal_tpu.config import Config
from mal_tpu.data.kitti import KITTIRAWDataset, KITTI_K
from mal_tpu.data.mono_dataset import ColorJitter, DataLoader, collate


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Fake KITTI raw layout with a 5-frame sequence."""
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "2011_09_26" / "2011_09_26_drive_0001_sync"
    img_dir = seq / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(5):
        arr = rng.randint(0, 255, (60, 200, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    return str(root)


def _filenames():
    return [f"2011_09_26/2011_09_26_drive_0001_sync {i} l" for i in (1, 2, 3)]


def test_kitti_dataset_item(kitti_root):
    ds = KITTIRAWDataset(kitti_root, _filenames(), 32, 96, [0, -1, 1],
                         is_train=False)
    item = ds[1]
    assert item["color"]["0"].shape == (32, 96, 3)
    assert item["color"]["-1"].shape == (32, 96, 3)
    assert item["color"]["1"].shape == (32, 96, 3)
    # full-res-scaled normalized K
    np.testing.assert_allclose(item["K"][0, 0], 0.58 * 96, rtol=1e-6)
    np.testing.assert_allclose(item["K"][1, 1], 1.92 * 32, rtol=1e-6)
    # eval mode: color_aug == color
    np.testing.assert_allclose(item["color_aug"]["0"], item["color"]["0"])


def test_kitti_missing_frame_is_zeros(kitti_root):
    """Start-of-sequence: frame -1 of index 0 doesn't exist -> zero dummy
    (`mono_dataset.py:169-174`)."""
    files = ["2011_09_26/2011_09_26_drive_0001_sync 0 l"]
    ds = KITTIRAWDataset(kitti_root, files, 32, 96, [0, -1, 1], is_train=False)
    item = ds[0]
    assert item["color"]["-1"].sum() == 0
    assert item["color"]["0"].sum() > 0


def test_dataloader_batching_and_sharding(kitti_root):
    ds = KITTIRAWDataset(kitti_root, _filenames() * 4, 32, 96, [0, -1],
                         is_train=True, seed=1)
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["color"]["0"].shape == (4, 32, 96, 3)

    # host sharding splits the stream disjointly
    l0 = DataLoader(ds, 2, shuffle=False, shard=(0, 2))
    l1 = DataLoader(ds, 2, shuffle=False, shard=(1, 2))
    assert len(l0) == len(l1) == 3


def test_color_jitter_is_deterministic_per_item():
    import random

    rng = random.Random(7)
    j1 = ColorJitter(rng)
    img = Image.fromarray(np.full((8, 8, 3), 128, np.uint8))
    out1 = np.asarray(j1(img))
    rng2 = random.Random(7)
    j2 = ColorJitter(rng2)
    out2 = np.asarray(j2(img))
    np.testing.assert_array_equal(out1, out2)


def test_checkpoint_roundtrip(tmp_path):
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state
    from mal_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                          load_config, save_checkpoint)

    cfg = Config(height=64, width=96, num_depth_bins=16, batch_size=2)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)

    path = save_checkpoint(str(tmp_path / "ckpt"), state, cfg)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    restored = load_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.bins.min_depth) == float(state.bins.min_depth)

    cfg2 = load_config(str(tmp_path / "ckpt"))
    assert cfg2.height == 64 and cfg2.num_depth_bins == 16


def test_doj_mask_attachment(kitti_root, tmp_path):
    from mal_tpu.data.doj import attach_doj_masks

    ds = KITTIRAWDataset(kitti_root, _filenames(), 32, 96, [0, -1, 1],
                         is_train=False)
    doj_root = tmp_path / "masks"
    doj_root.mkdir()
    key = "2011_09_26_2011_09_26_drive_0001_sync_1_l"
    m = np.zeros((60, 200), np.float32)
    m[10:30, 40:120] = 1.0
    np.save(doj_root / f"{key}.npy", m)
    np.save(doj_root / f"{key}-1.npy", m)

    wrapped = attach_doj_masks(ds, str(doj_root))
    item = wrapped[0]  # filenames[0] -> frame 1
    assert item["doj_mask"].shape == (32, 96)
    assert item["doj_mask"].max() == 1.0
    assert item["doj_mask-1"].max() == 1.0
    assert item["doj_mask+1"].max() == 0.0  # missing file -> zeros

    batch = collate([wrapped[0], wrapped[0]])
    assert batch["doj_mask"].shape == (2, 32, 96)
    assert batch["color"]["0"].shape == (2, 32, 96, 3)


def test_ddad_export_sample_roundtrip(tmp_path):
    """export_sample -> npz -> DDADDataset item (dgp-free path)."""
    from mal_tpu.data.export_ddad import export_sample
    from mal_tpu.data.ddad import DDADDataset

    rng = np.random.RandomState(0)

    def datum(with_depth):
        d = {"rgb": Image.fromarray(
                 rng.randint(0, 255, (120, 200, 3), np.uint8)),
             "intrinsics": np.array([[200.0, 0, 100], [0, 120.0, 60],
                                     [0, 0, 1]], np.float32)}
        if with_depth:
            d["depth"] = rng.uniform(1, 200, (120, 200)).astype(np.float32)
        return d

    context = [[datum(False)], [datum(True)], [datum(False)]]
    sample = export_sample(context, width=96, height=64)
    assert sample["color"].shape == (64, 96, 3)
    # intrinsics scaled to the export resolution
    np.testing.assert_allclose(sample["K"][0, 0], 200.0 * 96 / 200, rtol=1e-6)
    np.testing.assert_allclose(sample["K"][1, 1], 120.0 * 64 / 120, rtol=1e-6)

    split_dir = tmp_path / "train"
    split_dir.mkdir()
    np.savez_compressed(split_dir / "000000.npz", **sample)

    ds = DDADDataset(str(tmp_path), height=64, width=96, is_train=True)
    item = ds[0]
    assert item["color"]["0"].shape == (64, 96, 3)
    assert item["color"]["-1"].shape == (64, 96, 3)
    assert item["depth_gt"].shape == (120, 200)
    np.testing.assert_allclose(item["K"][0, 0], sample["K"][0, 0], rtol=1e-6)
