"""Export oracle: the reference's OWN code loads mal_tpu-exported weights.

The strongest validation of `convert/export_pth.py`: a randomly-initialized
mal_tpu MALModel is exported to the reference's per-net `.pth` layout, the
reference's `RepDepth.load_manydepth` (`repdepth.py:76-99`) ingests it
UNMODIFIED, its `validate` pipeline (`manydepth/evaluate_depth.py:66-288`)
runs end to end, and the 7 eval metrics must agree with mal_tpu's own eval
of the original (never-exported) weights — proving a model trained in
mal_tpu is directly consumable by the reference's tooling.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims

install_reference_shims()

H, W = 96, 320
GT_H, GT_W = 144, 480
N_IMAGES = 4
DRIVE = "2011_09_26/2011_09_26_drive_0002_sync"
METRICS = ["abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"]


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_oracle_kitti")
    data = root / "data"
    img_dir = data / DRIVE / "image_02" / "data"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(21)
    from PIL import Image
    for f in range(N_IMAGES + 2):
        arr = rng.randint(0, 255, size=(160, 512, 3), dtype=np.uint8)
        arr = (arr.astype(np.float32) + np.roll(arr, 1, 0)
               + np.roll(arr, 1, 1) + np.roll(arr, 2, 1)) / 4.0
        Image.fromarray(arr.astype(np.uint8)).save(
            img_dir / f"{f:010d}.jpg", quality=95)
    split_dir = root / "splits" / "eigen"
    split_dir.mkdir(parents=True)
    lines = [f"{DRIVE} {f} l" for f in range(1, 1 + N_IMAGES)]
    (split_dir / "test_files.txt").write_text("\n".join(lines) + "\n")
    gts = []
    for _ in range(N_IMAGES):
        g = rng.uniform(0.5, 70.0, size=(GT_H, GT_W)).astype(np.float32)
        g[rng.rand(GT_H, GT_W) < 0.1] = 0.0
        gts.append(g)
    gt_arr = np.empty(N_IMAGES, dtype=object)
    for i, g in enumerate(gts):
        gt_arr[i] = g
    np.savez_compressed(split_dir / "gt_depths.npz", data=gt_arr)
    return {"root": root, "data": str(data), "gts": gts, "files": lines}


@pytest.fixture(scope="module")
def mal_weights_and_export(tmp_path_factory):
    """Random-init mal_tpu MALModel -> exported reference-layout dir."""
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.export_pth import export_mal_checkpoint_dir
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel

    cfg = Config(height=H, width=W, batch_size=2, use_pallas=False,
                 eval_split="eigen")
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(31)
    batch = synthetic_batch(cfg, rng, batch_size=1)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.3),
                           jnp.asarray(12.0), rng, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    out = tmp_path_factory.mktemp("export_oracle_ckpt")
    export_mal_checkpoint_dir(
        params, stats, str(out),
        extras={"min_depth_bin": 0.3, "max_depth_bin": 12.0}, num_layers=18)
    return {"cfg": cfg, "model": model, "params": params, "stats": stats,
            "export_dir": str(out)}


def test_reference_loads_exported_checkpoint_and_metrics_match(
        kitti_tree, mal_weights_and_export):
    from manydepth import evaluate_depth as ref_eval
    from manydepth import networks
    from manydepth.options import MonodepthOptions

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", kitti_tree["data"], "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--eval_split", "eigen", "--batch_size", "2", "--num_workers", "0",
    ])
    opt.min_depth, opt.max_depth = 1e-3, 80.0
    opt.eval_teacher = True

    torch.manual_seed(99)
    ref_model = networks.RepDepth(opt)
    # the reference's own pretrained-checkpoint ingestion path
    # (`repdepth.py:76-99`): per-net files, bins read from encoder.pth
    min_b, max_b = ref_model.load_manydepth(
        None, False, pretrained_folder=mal_weights_and_export["export_dir"])
    np.testing.assert_allclose(float(min_b), 0.3, rtol=1e-6)
    np.testing.assert_allclose(float(max_b), 12.0, rtol=1e-6)

    # guard against silent strict=False no-ops: every exported tensor must
    # actually land (spot-check a few against the mal params)
    p = mal_weights_and_export["params"]
    got = ref_model.depth.state_dict()["decoder.10.conv.weight"].numpy()
    want = np.transpose(
        np.asarray(p["depth"]["dispconv_0"]["conv"]["kernel"]), (3, 2, 0, 1))
    np.testing.assert_array_equal(got, want)
    got = ref_model.mono_encoder.state_dict()["encoder.conv1.weight"].numpy()
    want = np.transpose(
        np.asarray(p["mono_encoder"]["encoder"]["conv1"]["kernel"]),
        (3, 2, 0, 1))
    np.testing.assert_array_equal(got, want)

    ref_model.eval()
    cwd = os.getcwd()
    os.chdir(kitti_tree["root"])
    try:
        with torch.no_grad():
            mean_errors, mean_errors_mono = ref_eval.validate(
                ref_model, opt, torch.tensor(0.3), torch.tensor(12.0))
    finally:
        os.chdir(cwd)
    ref_student = dict(zip(METRICS, np.asarray(mean_errors, np.float64)))
    ref_teacher = dict(zip(METRICS, np.asarray(mean_errors_mono, np.float64)))

    # mal_tpu evals the ORIGINAL weights (never exported/re-imported)
    import jax.numpy as jnp

    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.eval.evaluate import evaluate_depth_maps, infer_disparities

    cfg = mal_weights_and_export["cfg"]
    variables = {"params": mal_weights_and_export["params"],
                 "batch_stats": mal_weights_and_export["stats"]}
    ds = KITTIRAWDataset(kitti_tree["data"], kitti_tree["files"], H, W,
                         (0, -1), is_train=False, img_ext=".jpg")
    for teacher, ref in ((False, ref_student), (True, ref_teacher)):
        loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
        disps = infer_disparities(
            mal_weights_and_export["model"], variables, loader, cfg,
            eval_teacher=teacher, min_depth_bin=jnp.asarray(0.3),
            max_depth_bin=jnp.asarray(12.0))
        ours = evaluate_depth_maps(disps, kitti_tree["gts"],
                                   eval_split="eigen")
        for k in METRICS:
            tol = 2e-4 * max(1.0, abs(ref[k]))
            assert abs(ref[k] - ours[k]) <= tol, (
                f"{'teacher' if teacher else 'student'}/{k}: "
                f"reference(exported)={ref[k]:.6f} mal={ours[k]:.6f}")
