"""Precomputed segmenter-instance cache (`segment/cache.py`).

The cache replaces the temporal hint's current-frame segmenter forward
(`train/step.py` inst_cur; reference: `manydepth/dyn_utils.py:125`) with a
disk load, so the tests assert BIT-exactness end to end: pack/unpack,
export -> dataset load vs the online forward on the identical image (both
orientations), and the cached train step vs the online train step.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mal_tpu.config import Config
from mal_tpu.data.kitti import KITTIRAWDataset
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import MALModel
from mal_tpu.segment.cache import (cache_path, export_split_instances,
                                   instances_from_batch,
                                   load_frame_instances, pack_masks,
                                   save_frame_instances, unpack_masks)
from mal_tpu.segment.instances import Instances
from mal_tpu.train.state import create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step

SMALL = Config(height=64, width=96, num_depth_bins=16, batch_size=2)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    masks = (rng.rand(4, 13, 37) > 0.5).astype(np.float32)  # odd W
    packed = pack_masks(masks)
    assert packed.dtype == np.uint8 and packed.shape == (4, 13, 5)
    np.testing.assert_array_equal(unpack_masks(packed, 37), masks)


def test_save_load_frame_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    masks = (rng.rand(8, 16, 24) > 0.7).astype(np.float32)
    classes = rng.randint(0, 80, 8).astype(np.int32)
    scores = rng.rand(8).astype(np.float32)
    valid = rng.rand(8) > 0.3
    path = str(tmp_path / "frame.npz")
    save_frame_instances(path, masks, classes, scores, valid)
    got = load_frame_instances(path)
    np.testing.assert_array_equal(got["seg_masks"], masks)
    np.testing.assert_array_equal(got["seg_classes"], classes)
    np.testing.assert_array_equal(got["seg_scores"], scores)
    np.testing.assert_array_equal(got["seg_valid"], valid)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_segcache")
    seq = root / "2011_09_26" / "2011_09_26_drive_0001_sync"
    img_dir = seq / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(5):
        arr = rng.randint(0, 255, (60, 200, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.jpg")
    return str(root)


FILES = [f"2011_09_26/2011_09_26_drive_0001_sync {i} l" for i in (1, 2, 3)]


@pytest.fixture(scope="module")
def tiny_seg(kitti_root):
    """Tiny frozen segmenter + its exported cache for the fixture split."""
    from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn

    model = Mask2Former(num_classes=5, swin_size="tiny", num_queries=8,
                        max_instances=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 3)))
    seg_fn = jax.jit(make_seg_fn(model, None, 4))
    return seg_fn, variables


def test_export_then_dataset_load_bit_exact(kitti_root, tiny_seg, tmp_path):
    seg_fn, variables = tiny_seg
    out = str(tmp_path / "cache")
    ds = KITTIRAWDataset(kitti_root, FILES, 64, 96, [0, -1, 1],
                         is_train=True)
    n = export_split_instances(ds, seg_fn, variables, out, batch_size=2)
    # 3 unique frames x 2 orientations
    assert n == 6
    # resumable: a second export writes nothing
    assert export_split_instances(ds, seg_fn, variables, out,
                                  batch_size=2) == 0

    for flip in (False, True):
        ds2 = KITTIRAWDataset(kitti_root, FILES, 64, 96, [0, -1, 1],
                              is_train=True, seg_cache_root=out)
        ds2._rng = random.Random(0)
        ds2._rng.random = lambda: 0.9 if flip else 0.1  # pin flip draw
        item = ds2[0]
        assert item["seg_masks"].shape == (4, 64, 96)
        # the cached instances == the online forward on this item's image:
        # masks/classes/valid BIT-equal; scores to fp32 round-off only
        # (the export ran at a different batch shape, so XLA fusion
        # differs at the LSB — scores are consumed through a 0.9
        # threshold, `temporal.py:150`)
        inst = jax.device_get(
            seg_fn(variables, jnp.asarray(item["color"]["0"][None])))
        np.testing.assert_array_equal(item["seg_masks"], inst.masks[0])
        np.testing.assert_array_equal(item["seg_classes"], inst.classes[0])
        np.testing.assert_allclose(item["seg_scores"], inst.scores[0],
                                   rtol=1e-5)
        np.testing.assert_array_equal(item["seg_valid"], inst.valid[0])


def test_cache_miss_raises(kitti_root, tmp_path):
    ds = KITTIRAWDataset(kitti_root, FILES, 64, 96, [0, -1, 1],
                         is_train=True, seg_cache_root=str(tmp_path / "no"))
    with pytest.raises(FileNotFoundError, match="export-seg"):
        ds[0]


def _dummy_seg_fn(seg_variables, images):
    """Deterministic fake segmenter (one box instance per image) — stands in
    for both the online inst_cur forward and the warped-frame forwards."""
    B, H, W, _ = images.shape
    inst = Instances.empty(B, 4, H, W)
    masks = inst.masks.at[:, 0, H // 4:H // 2, W // 4:W // 2].set(1.0)
    return Instances(
        masks=masks,
        classes=inst.classes.at[:, 0].set(2),
        scores=inst.scores.at[:, 0].set(0.95),
        valid=inst.valid.at[:, 0].set(True),
    )


@pytest.mark.slow
def test_cached_train_step_matches_online():
    """cfg.seg_cache_root reads inst_cur from the batch; with identical
    instance content the whole step is bit-identical to the online path."""
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(SMALL, rng, batch_size=2)

    cfg_on = SMALL.replace(temporal=True)
    model = MALModel(cfg_on)
    state = create_train_state(cfg_on, model, rng, batch)
    tx = make_optimizer(cfg_on)
    step_on = jax.jit(make_train_step(cfg_on, model, tx,
                                      seg_fn=_dummy_seg_fn))
    _, metrics_on = step_on(state, batch, jax.random.PRNGKey(1),
                            jnp.zeros(()))

    # cached path: the same instances arrive as batch arrays
    inst = _dummy_seg_fn(None, batch["color"]["0"])
    batch_c = dict(batch, seg_masks=inst.masks, seg_classes=inst.classes,
                   seg_scores=inst.scores, seg_valid=inst.valid)
    cfg_c = SMALL.replace(temporal=True, seg_cache_root="cache-dir")
    step_c = jax.jit(make_train_step(cfg_c, model, tx,
                                     seg_fn=_dummy_seg_fn))
    _, metrics_c = step_c(state, batch_c, jax.random.PRNGKey(1),
                          jnp.zeros(()))

    assert float(metrics_on["loss"]) == float(metrics_c["loss"])
    # round-trip the batch Instances view
    back = instances_from_batch(batch_c)
    np.testing.assert_array_equal(np.asarray(back.masks),
                                  np.asarray(inst.masks))


def test_cache_path_flattens_folders(tmp_path):
    p = cache_path(str(tmp_path), "2011_09_26/seq_01", 7, "l", True)
    assert "/seq_01" not in p.split(str(tmp_path))[1][1:]
    assert p.endswith("2011_09_26__seq_01__0000000007_l_f.npz")


@pytest.mark.slow
def test_cli_export_seg_end_to_end(kitti_root, tmp_path, monkeypatch):
    """`cli export-seg` with a synthetic detectron2 .pkl: converts, runs
    the frozen segmenter over the split (both orientations), writes the
    cache, and the training dataset loads it."""
    import pickle

    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from tests.test_convert_mask2former import (TPixelDecoderSD, TPredictor,
                                                TSwin)

    torch.manual_seed(0)
    full = nn.Module()
    full.backbone = TSwin()
    head = nn.Module()
    head.pixel_decoder = TPixelDecoderSD()
    head.predictor = TPredictor(C=256, queries=100, classes=80, layers=9,
                                heads=8)
    full.sem_seg_head = head
    sd = {k: v.detach().numpy() for k, v in full.state_dict().items()
          if "relative_position_index" not in k}
    pkl = tmp_path / "model_final.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    # split dir resolved relative to CWD (`cli.py` readlines("splits/..."))
    workdir = tmp_path / "wd"
    sp = workdir / "splits" / "eigen_zhou"
    sp.mkdir(parents=True)
    (sp / "train_files.txt").write_text("\n".join(FILES) + "\n")
    monkeypatch.chdir(workdir)

    out = tmp_path / "cache"
    from mal_tpu.cli import main
    main(["export-seg", "--data_path", kitti_root, "--seg_pkl", str(pkl),
          "--out", str(out), "--size", "tiny",
          "--set", "height=64", "width=96", "batch_size=2",
          "max_instances=4", "compute_dtype=float32"])
    files = sorted(out.glob("*.npz"))
    assert len(files) == 6  # 3 frames x 2 orientations

    ds = KITTIRAWDataset(kitti_root, FILES, 64, 96, [0, -1, 1],
                         is_train=True, seg_cache_root=str(out))
    item = ds[0]
    assert item["seg_masks"].shape == (4, 64, 96)
    assert item["seg_valid"].dtype == bool
