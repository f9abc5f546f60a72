"""End-to-end parity oracle vs the reference's OWN DynamicDepth eval code.

Builds the reference `Trainer` (`dynamicdepth/trainer.py:86-273`) on a
synthetic KITTI tree and runs its actual `val()` (`trainer.py:756-905`) —
pose chaining, mono teacher, the DOMD forward-splat warp
(`rigid_warp.py:534-599`, z-buffer via the torch_sparse stub), the
occlusion-aware cost volume, and `compute_depth_losses` with the dynamic-
object ("doj") metric families — then compares all four metric streams
against `mal_tpu.dynamic.evaluate.evaluate_dynamic` on the same files with
the same converted weights.

Shims (tests/ref_oracle/stubs.py): torchvision/skimage/yacs/wandb/CUDA
no-ops; `torch_sparse.coalesce` (op='max') reconstructed; detectron2
import-surface only (never called on this path — its imports are dead for
eval_mode per SURVEY.md §1). One behavioral patch: `load_mask` is redirected
from the reference's hardcoded `/scratch1/...` mask root
(`dynamicdepth/datasets/kitti_dataset.py:101-107`) into the test's mask dir
— the naming scheme and load path otherwise run unmodified.
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

# Full-resolution variant (VERDICT r4 next #6): MAL_ORACLE_FULLRES=1 runs
# this same oracle at the reference's working resolution 192x640 (tens of
# minutes on a 1-core host vs ~2 min at 96x320, so it is an opt-in env
# knob rather than an always-on parametrization; results logged in
# PARITY.md "Full-resolution oracle runs").
H, W = ((192, 640) if os.environ.get("MAL_ORACLE_FULLRES") == "1"
        else (96, 320))
GT_H, GT_W = 144, 480
N_IMAGES = 3
SEQ = DRIVE.split("/")[1]


def _make_doj_masks(rng, n):
    """(H, W) 0/1 float masks with a dynamic blob inside the eigen crop.

    Coordinates scale with the oracle resolution (identical to the original
    absolute values at 96x320): at full-res the old fixed y0=40 landed
    ABOVE the eigen crop (which starts at 0.408*H), so the reference's own
    `losses['doj/count']` was zero and its eval divided by zero."""
    masks = []
    for i in range(n):
        m = np.zeros((H, W), np.float32)
        y0 = H * 40 // 96 + 3 * i
        x0 = W * 80 // 320 + 17 * i
        m[y0:y0 + H * 20 // 96, x0:x0 + W * 40 // 320] = 1.0
        masks.append(m)
    return masks


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_oracle_dyn")
    data, files = make_kitti_tree(root, N_IMAGES)
    gts = make_gt_depths(N_IMAGES, (GT_H, GT_W))
    write_split(root, "eigen", files, gts=gts)
    # train split only feeds len() in eval usage, but must exist + point at
    # real frames (Trainer builds the train DataLoader eagerly)
    write_split(root, "eigen_zhou", files)
    (root / "splits" / "eigen_zhou" / "withmask_files.txt").write_text(
        "\n".join(files) + "\n")

    rng = np.random.RandomState(77)
    masks = _make_doj_masks(rng, N_IMAGES)
    ref_masks = root / "ref_masks"
    our_masks = root / "our_masks"
    ref_masks.mkdir()
    our_masks.mkdir()
    for i, f in enumerate(range(1, 1 + N_IMAGES)):
        triplet = {"": masks[i],
                   "-1": np.roll(masks[i], -4, axis=1),
                   "+1": np.roll(masks[i], 4, axis=1)}
        for suf, m in triplet.items():
            # reference eval naming (`kitti_dataset.py:107`)
            np.save(ref_masks / f"{SEQ}_{f:010d}_{f}{suf}.npy", m)
            # mal_tpu naming (mal_tpu/data/doj.py)
            key = f"{DRIVE.replace('/', '_')}_{f}_l"
            np.save(our_masks / f"{key}{suf}.npy", m)
    return {"root": root, "data": data, "files": files, "gts": gts,
            "ref_masks": str(ref_masks), "our_masks": str(our_masks)}


@pytest.fixture(scope="module")
def ref_result(tree, tmp_path_factory, monkeypatch_module=None):
    from dynamicdepth.options import MonodepthOptions
    from dynamicdepth.datasets import kitti_dataset as ref_kitti
    from dynamicdepth import trainer as ref_trainer_mod

    log_dir = tmp_path_factory.mktemp("dyn_log")
    ck = tmp_path_factory.mktemp("dyn_ckpt")
    opt = MonodepthOptions().parser.parse_args([
        "--data_path", tree["data"], "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--dataset", "kitti", "--split", "eigen_zhou",
        "--eval_split", "eigen", "--batch_size", "2", "--num_workers", "0",
        "--log_dir", str(log_dir), "--no_cuda",
    ])
    # defaults point at checkpoint dirs that do not exist here; random init
    opt.load_weights_folder = None
    opt.mono_weights_folder = None

    # redirect the hardcoded /scratch1 mask root into the test tree,
    # preserving the reference's file-naming logic
    orig_load = ref_kitti.KITTIRAWDataset.load_mask

    def load_mask(self, path):
        return orig_load(self,
                         os.path.join(tree["ref_masks"], os.path.basename(path)))
    ref_kitti.KITTIRAWDataset.load_mask = load_mask

    cwd = os.getcwd()
    os.chdir(tree["root"])
    try:
        torch.manual_seed(21)
        trainer = ref_trainer_mod.Trainer(opt)
        g = torch.Generator().manual_seed(9)
        for net in trainer.models.values():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean = torch.randn(m.num_features,
                                                 generator=g) * 0.05
                    m.running_var = 1.0 + 0.1 * torch.rand(m.num_features,
                                                           generator=g)
        for name in ("encoder", "depth", "mono_encoder", "mono_depth",
                     "pose_encoder", "pose"):
            torch.save(trainer.models[name].state_dict(),
                       os.path.join(str(ck), f"{name}.pth"))
        errors, mono_err, doj_err = trainer.val()
    finally:
        os.chdir(cwd)
        ref_kitti.KITTIRAWDataset.load_mask = orig_load
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    return {"m": dict(zip(names, map(float, errors))),
            "mono": dict(zip(names, map(float, mono_err))),
            "doj": dict(zip(names, map(float, doj_err))),
            "ckpt": str(ck)}


@pytest.fixture(scope="module")
def our_result(tree, ref_result):
    from mal_tpu.config import Config
    from mal_tpu.data.doj import attach_doj_masks
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.dynamic.evaluate import (convert_dynamic_checkpoint_dir,
                                          evaluate_dynamic)

    cfg = Config(method="dynamicdepth", height=H, width=W,
                 frame_ids=(0, -1, 1), split="eigen_zhou", eval_split="eigen",
                 batch_size=1, use_pallas=False)
    params, stats, _ = convert_dynamic_checkpoint_dir(ref_result["ckpt"])
    ds = KITTIRAWDataset(tree["data"], tree["files"], H, W, (0, -1, 1),
                         is_train=False, img_ext=".jpg")
    ds = attach_doj_masks(ds, tree["our_masks"])
    loader = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False)
    return evaluate_dynamic(cfg, {"params": params, "batch_stats": stats},
                            iter(loader), tree["gts"],
                            min_depth_bin=0.1, max_depth_bin=10.0)


METRICS = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]


def _check(ref: dict, ours: dict, prefix: str, label: str):
    for k in METRICS:
        r, o = ref[k], ours[prefix + k]
        tol = 5e-4 * max(1.0, abs(r))
        assert abs(r - o) <= tol, (
            f"{label}/{k}: reference={r:.6f} mal_tpu={o:.6f} (tol {tol:.2e})")


def test_dynamic_student_metrics_match_reference(ref_result, our_result):
    _check(ref_result["m"], our_result, "", "student")


def test_dynamic_doj_metrics_match_reference(ref_result, our_result):
    assert our_result["doj_batches"] == N_IMAGES  # every image has doj pixels
    _check(ref_result["doj"], our_result, "doj/", "doj")


def test_dynamic_teacher_metrics_match_reference(ref_result, our_result):
    _check(ref_result["mono"], our_result, "mono/", "teacher")
