"""Export oracle (DualRefine): the reference's OWN eval runs mal weights.

A randomly-initialized mal_tpu `DEQDepthPose` is exported to the reference's
`depth_pose.pth` layout (`convert/export_dualref.py`), the reference's
`evaluate` (`dualrefine/evaluate_depth.py:67-190`) ingests it through its
filtered-strict `load_state_dict` and runs its full pipeline (HRNet,
epipolar sampler, ConvGRU, Gauss-Newton pose updates, Anderson solve,
consistency-mask blending); its saved per-image disparities must match
mal_tpu's eval of the ORIGINAL (never-exported) weights.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims
from tests.ref_oracle.synth import make_kitti_tree, write_split

install_reference_shims()

H, W = 96, 320
N_IMAGES = 2


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_oracle_dualref")
    data, files = make_kitti_tree(root, N_IMAGES)
    write_split(root, "eigen", files)
    return {"root": root, "data": data, "files": files}


@pytest.fixture(scope="module")
def mal_setup(tmp_path_factory):
    """mal_tpu DEQDepthPose random init -> exported depth_pose.pth dir."""
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.export_dualref import export_dualrefine_checkpoint_dir
    from mal_tpu.dualref.model import DEQDepthPose

    cfg = Config(method="dualrefine", height=H, width=W, frame_ids=(0, -1),
                 batch_size=2, use_pallas=False)
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(17)
    img = jnp.zeros((1, H, W, 3))
    K = jnp.eye(4)[None].at[0, 0, 0].set(0.58 * W).at[0, 1, 1].set(1.92 * H) \
        .at[0, 0, 2].set(0.5 * W).at[0, 1, 2].set(0.5 * H)
    variables = model.init(rng, img, img, K, invert=True, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    ck = tmp_path_factory.mktemp("export_dualref_ckpt")
    export_dualrefine_checkpoint_dir(
        params, stats, str(ck),
        extras={"min_depth_bin": 0.3, "max_depth_bin": 12.0,
                "mean_depth_bin": 4.0, "median_depth_bin": 3.5,
                "height": H, "width": W})
    return {"cfg": cfg, "model": model,
            "variables": {"params": params, "batch_stats": stats},
            "ckpt": str(ck)}


def test_reference_eval_runs_exported_dualref(tree, mal_setup):
    from dualrefine import evaluate_depth as ref_eval
    from dualrefine.options import MonodepthOptions

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", tree["data"], "--weights_init", "scratch",
        "--height", str(H), "--width", str(W), "--eval_split", "eigen",
        "--batch_size", "2", "--num_workers", "0",
        "--load_weights_folder", mal_setup["ckpt"],
        "--save_pred_disps", "--no_eval", "--combine_via_mask",
    ])

    torch.manual_seed(3)
    cwd = os.getcwd()
    os.chdir(tree["root"])
    try:
        with pytest.raises(SystemExit):  # --no_eval ends with quit()
            ref_eval.evaluate(opt)
    finally:
        os.chdir(cwd)
    ref_disps = np.load(os.path.join(mal_setup["ckpt"],
                                     "multi_eigen_split.npy"))

    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.dualref.evaluate import infer_disparities_dualref

    ds = KITTIRAWDataset(tree["data"], tree["files"], H, W, (0, -1),
                         is_train=False, img_ext=".jpg")
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    ours = infer_disparities_dualref(
        mal_setup["model"], mal_setup["variables"], loader,
        mal_setup["cfg"])
    assert ref_disps.shape == ours.shape
    # per-pixel agreement, tolerating knife-edge `combine_via_mask` flips:
    # the blend mask comes from a hard argmin over epipolar costs
    # (`depth_pose.py:611-666`), so fp32-roundoff can flip isolated pixels
    # between the refined and initial branches (observed: ~0.08% of pixels
    # on flax-initialized weights; the same-framework forward oracle is
    # immune because near-ties land identically on both sides there)
    diff = np.abs(ours - ref_disps)
    tol = 5e-4 + 1e-3 * np.abs(ref_disps)
    frac_bad = float(np.mean(diff > tol))
    assert frac_bad < 0.005, f"{frac_bad:.4%} of pixels disagree"
    assert float(np.median(diff)) < 5e-4
