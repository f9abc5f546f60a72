"""Export oracle (DynamicDepth): the reference's OWN Trainer loads mal weights.

A randomly-initialized mal_tpu `DynDepthModel` is exported to the per-net
`.pth` layout (`convert/export_pth.py:export_dynamic_checkpoint_dir`), the
reference's Trainer ingests it through its own `load_model` +
`load_mono_model` (`dynamicdepth/trainer.py:1380-1424` — incl. the depth-bin
restore from encoder.pth), runs its actual `val()` with the DOMD warp and
doj metric families, and all three metric streams must match mal_tpu's eval
of the ORIGINAL weights.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims
from tests.ref_oracle.synth import (DRIVE, make_gt_depths, make_kitti_tree,
                                    write_split)

install_reference_shims()

H, W = 96, 320
GT_H, GT_W = 144, 480
N_IMAGES = 3
SEQ = DRIVE.split("/")[1]
MIN_BIN, MAX_BIN = 0.3, 12.0
METRICS = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_oracle_dyn")
    data, files = make_kitti_tree(root, N_IMAGES)
    gts = make_gt_depths(N_IMAGES, (GT_H, GT_W))
    write_split(root, "eigen", files, gts=gts)
    write_split(root, "eigen_zhou", files)
    (root / "splits" / "eigen_zhou" / "withmask_files.txt").write_text(
        "\n".join(files) + "\n")

    masks = []
    for i in range(N_IMAGES):
        m = np.zeros((H, W), np.float32)
        m[40 + 3 * i:60 + 3 * i, 80 + 17 * i:120 + 17 * i] = 1.0
        masks.append(m)
    ref_masks = root / "ref_masks"
    our_masks = root / "our_masks"
    ref_masks.mkdir()
    our_masks.mkdir()
    for i, f in enumerate(range(1, 1 + N_IMAGES)):
        triplet = {"": masks[i],
                   "-1": np.roll(masks[i], -4, axis=1),
                   "+1": np.roll(masks[i], 4, axis=1)}
        for suf, m in triplet.items():
            np.save(ref_masks / f"{SEQ}_{f:010d}_{f}{suf}.npy", m)
            key = f"{DRIVE.replace('/', '_')}_{f}_l"
            np.save(our_masks / f"{key}{suf}.npy", m)
    return {"root": root, "data": data, "files": files, "gts": gts,
            "ref_masks": str(ref_masks), "our_masks": str(our_masks)}


@pytest.fixture(scope="module")
def mal_setup(tmp_path_factory):
    """mal_tpu DynDepthModel random init -> exported per-net .pth dir."""
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.export_pth import export_dynamic_checkpoint_dir
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.dynamic.model import DynDepthModel

    cfg = Config(method="dynamicdepth", height=H, width=W,
                 frame_ids=(0, -1, 1), split="eigen_zhou",
                 eval_split="eigen", batch_size=1, use_pallas=False)
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(23)
    batch = dict(synthetic_batch(cfg, rng, batch_size=1))
    doj = np.zeros((1, H, W), np.float32)
    doj[:, 40:60, 80:120] = 1.0
    for k in ("doj_mask", "doj_mask-1", "doj_mask+1"):
        batch[k] = jnp.asarray(doj)
    variables = model.init({"params": rng}, batch, jnp.asarray(MIN_BIN),
                           jnp.asarray(MAX_BIN), rng, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    ck = tmp_path_factory.mktemp("export_dyn_ckpt")
    export_dynamic_checkpoint_dir(
        params, stats, str(ck),
        extras={"min_depth_bin": MIN_BIN, "max_depth_bin": MAX_BIN})
    return {"cfg": cfg, "model": model, "params": params, "stats": stats,
            "ckpt": str(ck)}


@pytest.fixture(scope="module")
def ref_result(tree, mal_setup, tmp_path_factory):
    from dynamicdepth import trainer as ref_trainer_mod
    from dynamicdepth.datasets import kitti_dataset as ref_kitti
    from dynamicdepth.options import MonodepthOptions

    log_dir = tmp_path_factory.mktemp("dyn_log")
    opt = MonodepthOptions().parser.parse_args([
        "--data_path", tree["data"], "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--dataset", "kitti", "--split", "eigen_zhou",
        "--eval_split", "eigen", "--batch_size", "2", "--num_workers", "0",
        "--log_dir", str(log_dir), "--no_cuda",
        # the reference's own checkpoint ingestion: load_model takes
        # encoder/depth/pose (+ bins from encoder.pth,
        # `trainer.py:1410-1421`); load_mono_model takes the teacher nets
        "--load_weights_folder", mal_setup["ckpt"],
        "--mono_weights_folder", mal_setup["ckpt"],
    ])

    orig_load = ref_kitti.KITTIRAWDataset.load_mask

    def load_mask(self, path):
        return orig_load(
            self, os.path.join(tree["ref_masks"], os.path.basename(path)))
    ref_kitti.KITTIRAWDataset.load_mask = load_mask

    cwd = os.getcwd()
    os.chdir(tree["root"])
    try:
        torch.manual_seed(21)
        trainer = ref_trainer_mod.Trainer(opt)
        # the bin restore must have come from OUR exported encoder.pth
        assert float(trainer.min_depth_tracker) == MIN_BIN
        assert float(trainer.max_depth_tracker) == MAX_BIN
        errors, mono_err, doj_err = trainer.val()
    finally:
        os.chdir(cwd)
        ref_kitti.KITTIRAWDataset.load_mask = orig_load
    return {"m": dict(zip(METRICS, map(float, errors))),
            "mono": dict(zip(METRICS, map(float, mono_err))),
            "doj": dict(zip(METRICS, map(float, doj_err)))}


@pytest.fixture(scope="module")
def our_result(tree, mal_setup):
    from mal_tpu.data.doj import attach_doj_masks
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.dynamic.evaluate import evaluate_dynamic

    ds = KITTIRAWDataset(tree["data"], tree["files"], H, W, (0, -1, 1),
                         is_train=False, img_ext=".jpg")
    ds = attach_doj_masks(ds, tree["our_masks"])
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    return evaluate_dynamic(
        mal_setup["cfg"],
        {"params": mal_setup["params"], "batch_stats": mal_setup["stats"]},
        iter(loader), tree["gts"],
        min_depth_bin=MIN_BIN, max_depth_bin=MAX_BIN)


def _check(ref: dict, ours: dict, prefix: str, label: str,
           rel_tol: float = 5e-4):
    for k in METRICS:
        r, o = ref[k], ours[prefix + k]
        tol = rel_tol * max(1.0, abs(r))
        assert abs(r - o) <= tol, (
            f"{label}/{k}: reference(exported)={r:.6f} mal={o:.6f}")


def test_dynamic_export_student_metrics(ref_result, our_result):
    _check(ref_result["m"], our_result, "", "student")


def test_dynamic_export_doj_metrics(ref_result, our_result):
    # the doj family averages over a few hundred masked pixels, and random
    # flax-init weights push sq_rel to ~50, so fp32 path differences show up
    # at ~1e-3 relative (observed 8e-4 on sq_rel; the full-image streams
    # hold 5e-4) — same agreement level as the forward oracle, smaller N
    _check(ref_result["doj"], our_result, "doj/", "doj", rel_tol=2e-3)


def test_dynamic_export_teacher_metrics(ref_result, our_result):
    _check(ref_result["mono"], our_result, "mono/", "teacher")
