"""End-to-end parity oracle vs the reference's OWN eval code (ManyDepth/MAL).

Unlike the torch-twin tests (written from *reading* the reference), this module
imports `/root/reference/manydepth` and executes its actual `validate`
pipeline (`manydepth/evaluate_depth.py:66-288`) — dataset loading, pose
chaining, cost-volume encoder, depth decoder, disp_to_depth, cv2 resize,
eigen crop, median scaling, 7 metrics — on a synthetic KITTI-raw tree with a
randomly-initialized reference `RepDepth`. The same checkpoint is then
converted with `mal_tpu.convert.torch_weights` and evaluated through the
mal_tpu pipeline on the same files; the 7 mean metrics must agree.

Missing reference deps (torchvision/skimage/CUDA) are shimmed by
`tests/ref_oracle/stubs.py`; the reference itself is executed unmodified.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims

install_reference_shims()

# Full-resolution variant (VERDICT r4 next #6): MAL_ORACLE_FULLRES=1 runs
# this same oracle at the reference's working resolution 192x640 (tens of
# minutes on a 1-core host vs ~2 min at 96x320, so it is an opt-in env
# knob rather than an always-on parametrization; results logged in
# PARITY.md "Full-resolution oracle runs").
H, W = ((192, 640) if os.environ.get("MAL_ORACLE_FULLRES") == "1"
        else (96, 320))
GT_H, GT_W = 144, 480     # GT resolution (exercises the disp resize)
N_IMAGES = 4
DRIVE = "2011_09_26/2011_09_26_drive_0002_sync"


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Synthetic KITTI-raw tree + eigen split dir, shared by both pipelines."""
    root = tmp_path_factory.mktemp("ref_oracle_kitti")
    data = root / "data"
    img_dir = data / DRIVE / "image_02" / "data"
    img_dir.mkdir(parents=True)

    rng = np.random.RandomState(42)
    from PIL import Image
    # frames 0..N_IMAGES+1 so every eval frame f has f-1 on disk
    for f in range(N_IMAGES + 2):
        # source images larger than the model res so the loader's
        # downscale path is exercised at either oracle resolution
        arr = rng.randint(0, 255, size=(max(160, H + 64),
                                        max(512, W + 128), 3),
                          dtype=np.uint8)
        # smooth a little so JPEG error stays small and photometrics are sane
        arr = (arr.astype(np.float32) + np.roll(arr, 1, 0) +
               np.roll(arr, 1, 1) + np.roll(arr, 2, 1)) / 4.0
        Image.fromarray(arr.astype(np.uint8)).save(
            img_dir / f"{f:010d}.jpg", quality=95)

    split_dir = root / "splits" / "eigen"
    split_dir.mkdir(parents=True)
    lines = [f"{DRIVE} {f} l" for f in range(1, 1 + N_IMAGES)]
    (split_dir / "test_files.txt").write_text("\n".join(lines) + "\n")

    gts = []
    for _ in range(N_IMAGES):
        g = rng.uniform(0.5, 70.0, size=(GT_H, GT_W)).astype(np.float32)
        g[rng.rand(GT_H, GT_W) < 0.1] = 0.0  # sparse invalid pixels
        gts.append(g)
    gt_arr = np.empty(N_IMAGES, dtype=object)  # ragged-style object array
    for i, g in enumerate(gts):
        gt_arr[i] = g
    np.savez_compressed(split_dir / "gt_depths.npz", data=gt_arr)
    return {"root": root, "data": str(data), "gts": gts,
            "files": lines}


@pytest.fixture(scope="module")
def ref_model_and_ckpt(tmp_path_factory):
    """Reference RepDepth with random (seeded) weights + saved ckpt dir."""
    from manydepth.options import MonodepthOptions
    from manydepth import networks

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", "unset", "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--eval_split", "eigen", "--batch_size", "2", "--num_workers", "0",
    ])
    opt.min_depth, opt.max_depth = 1e-3, 80.0
    opt.eval_teacher = True  # validate then returns (student, teacher) metrics

    torch.manual_seed(7)
    model = networks.RepDepth(opt)
    # randomize BN running stats so eval-mode normalization is non-trivial
    g = torch.Generator().manual_seed(13)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.05
            m.running_var = 1.0 + 0.1 * torch.rand(m.num_features, generator=g)
    model.eval()

    ck = tmp_path_factory.mktemp("ref_oracle_ckpt")
    torch.save(model.state_dict(), ck / "model.pth")
    torch.save({"min_depth_bin": torch.tensor(0.3),
                "max_depth_bin": torch.tensor(12.0)}, ck / "track.pth")
    return {"model": model, "opt": opt, "ckpt": str(ck)}


@pytest.fixture(scope="module")
def ref_metrics(kitti_tree, ref_model_and_ckpt):
    """Run the reference's own `validate` (CPU, shimmed .cuda)."""
    from manydepth import evaluate_depth as ref_eval

    opt = ref_model_and_ckpt["opt"]
    opt.data_path = kitti_tree["data"]
    cwd = os.getcwd()
    os.chdir(kitti_tree["root"])  # validate resolves "./splits" relative
    try:
        with torch.no_grad():
            mean_errors, mean_errors_mono = ref_eval.validate(
                ref_model_and_ckpt["model"], opt,
                torch.tensor(0.3), torch.tensor(12.0))
    finally:
        os.chdir(cwd)
    names = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]
    return (dict(zip(names, np.asarray(mean_errors, dtype=np.float64))),
            dict(zip(names, np.asarray(mean_errors_mono, dtype=np.float64))))


@pytest.fixture(scope="module")
def ours_metrics(kitti_tree, ref_model_and_ckpt):
    """Convert the same checkpoint and run the mal_tpu eval pipeline."""
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.torch_weights import convert_mal_checkpoint_dir
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.eval.evaluate import evaluate_depth_maps, infer_disparities
    from mal_tpu.models import MALModel

    cfg = Config(height=H, width=W, batch_size=2, use_pallas=False,
                 eval_split="eigen")
    params, stats, extras = convert_mal_checkpoint_dir(
        ref_model_and_ckpt["ckpt"], 18)
    model = MALModel(cfg)
    ds = KITTIRAWDataset(kitti_tree["data"], kitti_tree["files"], H, W,
                         (0, -1), is_train=False, img_ext=".jpg")
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    out = {}
    for teacher in (False, True):
        disps = infer_disparities(
            model, {"params": params, "batch_stats": stats}, loader, cfg,
            eval_teacher=teacher,
            min_depth_bin=jnp.asarray(float(extras["min_depth_bin"])),
            max_depth_bin=jnp.asarray(float(extras["max_depth_bin"])))
        out[teacher] = evaluate_depth_maps(
            disps, kitti_tree["gts"], eval_split="eigen")
    return out[False], out[True]


METRICS = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]


def _assert_close(ref: dict, ours: dict, label: str):
    for k in METRICS:
        r, o = ref[k], ours[k]
        tol = 2e-4 * max(1.0, abs(r))
        assert abs(r - o) <= tol, (
            f"{label}/{k}: reference={r:.6f} mal_tpu={o:.6f} (tol {tol:.2e})")


def test_manydepth_student_metrics_match_reference(ref_metrics, ours_metrics):
    """Student (multi-frame cost-volume) eval: 7 metrics vs reference code."""
    _assert_close(ref_metrics[0], ours_metrics[0], "student")


def test_manydepth_teacher_metrics_match_reference(ref_metrics, ours_metrics):
    """Mono teacher eval (`--eval_teacher`): 7 metrics vs reference code."""
    _assert_close(ref_metrics[1], ours_metrics[1], "teacher")
