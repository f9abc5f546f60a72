"""Catalog + mapper tests for the auxiliary segmentation datasets
(`mask2former/data/datasets/*`, `data/dataset_mappers/*` analogues)."""

import json

import numpy as np
import pytest

from mal_tpu.segment.datasets import (
    CATALOGS, SegCatalog, SemSegFolderDataset, catalog_from_panoptic_json,
    cityscapes_labelid_to_trainid, pad_divisible, panoptic_to_targets,
    rgb2id, semantic_to_targets)


def test_catalog_registry_contracts():
    cs = CATALOGS["cityscapes_sem_seg"]
    assert cs.num_classes == 19 and cs.ignore_label == 255
    assert CATALOGS["ade20k_sem_seg"].num_classes == 150
    # Mapillary's ignore label is 65, not 255 (upstream calls this out,
    # `register_mapillary_vistas.py:501`)
    mv = CATALOGS["mapillary_vistas_sem_seg"]
    assert mv.num_classes == 65 and mv.ignore_label == 65
    assert CATALOGS["coco_stuff_10k_sem_seg"].num_classes == 171
    assert CATALOGS["coco_panoptic"].num_classes == 133
    pan = CATALOGS["cityscapes_panoptic"]
    assert pan.thing_ids == tuple(range(11, 19))  # person..bicycle


def test_cityscapes_trainid_mapping():
    lab = np.array([[7, 8, 26], [0, 33, 99]], np.uint8)
    tid = cityscapes_labelid_to_trainid(lab)
    assert tid.tolist() == [[0, 1, 13], [255, 18, 255]]


def test_semantic_to_targets_unique_classes():
    cat = CATALOGS["cityscapes_sem_seg"]
    sem = np.full((8, 12), 255, np.int32)
    sem[:4] = 7     # road -> train id 0
    sem[4:, :6] = 26  # car -> 13
    labels, masks, valid = semantic_to_targets(sem, cat, max_segments=4)
    assert valid.tolist() == [True, True, False, False]
    assert sorted(labels[valid].tolist()) == [0, 13]
    got = {int(l): m for l, m in zip(labels[:2], masks[:2])}
    assert got[0].sum() == 4 * 12 and got[13].sum() == 4 * 6
    # all-ignore image -> zero valid targets (the reference's empty
    # Instances branch)
    l2, m2, v2 = semantic_to_targets(
        np.full((4, 4), 255, np.int32), cat, 4)
    assert not v2.any() and m2.sum() == 0


def test_semantic_label_shift_ade():
    cat = CATALOGS["ade20k_sem_seg"]     # pngs: 0=ignore, 1..150
    sem = np.zeros((4, 6), np.int32)
    sem[:, :3] = 1    # class 0 after shift
    sem[:, 3:] = 150  # class 149
    labels, masks, valid = semantic_to_targets(sem, cat, 4)
    assert sorted(labels[valid].tolist()) == [0, 149]
    assert valid.sum() == 2


def test_panoptic_rgb2id_and_targets():
    cat = SegCatalog("toy_pan", 5, 255, thing_ids=(1,))
    H, W = 6, 8
    png = np.zeros((H, W, 3), np.uint8)
    png[:3] = [1, 0, 0]            # id 1
    png[3:] = [0, 2, 0]            # id 512
    ids = rgb2id(png)
    assert set(np.unique(ids)) == {1, 512}
    segs = [{"id": 1, "category_id": 2, "iscrowd": 0},
            {"id": 512, "category_id": 4, "iscrowd": 0},
            {"id": 999, "category_id": 1, "iscrowd": 1}]  # crowd skipped
    labels, masks, valid = panoptic_to_targets(png, segs, cat, 4)
    assert valid.tolist() == [True, True, False, False]
    assert labels[:2].tolist() == [2, 4]
    assert masks[0].sum() == 3 * W and masks[1].sum() == 3 * W


def test_catalog_from_panoptic_json(tmp_path):
    cats = [{"id": 7, "name": "sky", "isthing": 0},
            {"id": 24, "name": "person", "isthing": 1},
            {"id": 26, "name": "car", "isthing": 1}]
    p = tmp_path / "categories.json"
    p.write_text(json.dumps(cats))
    cat = catalog_from_panoptic_json("toy", str(p))
    assert cat.num_classes == 3
    assert cat.thing_ids == (1, 2)
    assert cat.label_map == {7: 0, 24: 1, 26: 2}
    assert cat.class_names == ("sky", "person", "car")


def test_pad_divisible_semantics():
    cat = CATALOGS["ade20k_sem_seg"]
    img = np.zeros((30, 45, 3), np.uint8)
    sem = np.zeros((30, 45), np.int32)
    pan = np.zeros((30, 45), np.uint32)
    img2, sem2, pan2 = pad_divisible(img, sem, 32, cat, pan)
    assert img2.shape == (32, 64, 3) and sem2.shape == (32, 64)
    # image pads with 128, semantic with ignore, panoptic with VOID=0
    assert img2[31, 0, 0] == 128 and sem2[31, 0] == cat.ignore_label
    assert pan2[31, 0] == 0


def test_sem_seg_folder_dataset(tmp_path):
    from PIL import Image

    cat = CATALOGS["cityscapes_sem_seg"]
    (tmp_path / "img" / "seq0").mkdir(parents=True)
    (tmp_path / "gt" / "seq0").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (20, 28, 3), np.uint8)).save(
            tmp_path / "img" / "seq0" / f"f{i}.jpg")
        lab = np.full((20, 28), 7, np.uint8)
        lab[10:] = 26
        Image.fromarray(lab).save(tmp_path / "gt" / "seq0" / f"f{i}.png")
    ds = SemSegFolderDataset(str(tmp_path / "img"), str(tmp_path / "gt"),
                             cat, size_divisibility=16)
    assert len(ds) == 2
    img, (labels, masks, valid) = ds.targets(0, max_segments=4)
    assert img.shape == (32, 32, 3)          # padded to /16
    assert valid.sum() == 2
    assert sorted(labels[valid].tolist()) == [0, 13]
    # padded region is ignore -> contributes to no class mask
    assert masks[:, 20:, :].sum() == 0


def test_targets_feed_the_set_criterion():
    """The mapper targets drive the SAME jit criterion as the COCO
    instance path (shape contract parity with coco_to_targets)."""
    import jax
    import jax.numpy as jnp

    from mal_tpu.segment.criterion import CriterionConfig, set_criterion

    cat = CATALOGS["cityscapes_sem_seg"]
    sem = np.full((16, 16), 7, np.int32)
    sem[8:] = 26
    labels, masks, valid = semantic_to_targets(sem, cat, 4)
    B, Q, K = 1, 6, cat.num_classes
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(B, Q, K + 1).astype(np.float32))
    pmasks = jnp.asarray(rng.randn(B, Q, 16, 16).astype(np.float32))
    out = set_criterion(jax.random.PRNGKey(0), logits, pmasks,
                        jnp.asarray(labels[None]), jnp.asarray(masks[None]),
                        jnp.asarray(valid[None]),
                        CriterionConfig(num_classes=K))
    for k, v in out.items():
        assert bool(jnp.isfinite(v)), k
