"""End-to-end parity oracle vs the reference's OWN DualRefine eval code.

Executes `/root/reference/dualrefine/evaluate_depth.py:67-190` (`evaluate`)
— its dataset loading, the real `DEQDepthPose` (HRNet + epipolar sampler +
ConvGRU update + Gauss-Newton pose refinement + Anderson fixed-point solve +
consistency-mask blending) — with `--save_pred_disps --no_eval`, and compares
the saved per-image scaled disparities against the mal_tpu DualRefine
pipeline run on the same synthetic KITTI tree after converting the same
`depth_pose.pth`.

One reference dependency is reconstructed rather than executed: the DEQ
`lib/` package is missing from the reference snapshot (SURVEY.md §1 known
defects); `tests/ref_oracle/deq_lib.py` rebuilds its public API
(anderson/broyden, phantom-grad factory, weight_norm). All other reference
code runs unmodified (torchvision/skimage/CUDA shims aside).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims
from tests.ref_oracle.synth import make_kitti_tree, write_split

install_reference_shims()

# Full-resolution variant (VERDICT r4 next #6): MAL_ORACLE_FULLRES=1 runs
# this same oracle at the reference's working resolution 192x640 (tens of
# minutes on a 1-core host vs ~2 min at 96x320, so it is an opt-in env
# knob rather than an always-on parametrization; results logged in
# PARITY.md "Full-resolution oracle runs").
H, W = ((192, 640) if os.environ.get("MAL_ORACLE_FULLRES") == "1"
        else (96, 320))
N_IMAGES = 2


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ref_oracle_dualref")
    data, files = make_kitti_tree(root, N_IMAGES)
    write_split(root, "eigen", files)
    return {"root": root, "data": data, "files": files}


@pytest.fixture(scope="module")
def ref_setup(tree, tmp_path_factory):
    """Reference opts + random-weight `depth_pose.pth` in reference layout."""
    from dualrefine.options import MonodepthOptions
    from dualrefine import networks

    ck = tmp_path_factory.mktemp("dualref_ckpt")
    opt = MonodepthOptions().parser.parse_args([
        "--data_path", tree["data"], "--weights_init", "scratch",
        "--height", str(H), "--width", str(W), "--eval_split", "eigen",
        "--batch_size", "2", "--num_workers", "0",
        "--load_weights_folder", str(ck),
        "--save_pred_disps", "--no_eval", "--combine_via_mask",
    ])

    torch.manual_seed(11)
    model = networks.DEQDepthPose(args=opt)
    g = torch.Generator().manual_seed(5)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.05
            m.running_var = 1.0 + 0.1 * torch.rand(m.num_features, generator=g)

    sd = model.state_dict()
    sd["min_depth_bin"] = torch.tensor(0.3)
    sd["max_depth_bin"] = torch.tensor(12.0)
    sd["mean_depth_bin"] = torch.tensor(4.0)
    sd["median_depth_bin"] = torch.tensor(3.5)
    sd["height"] = H
    sd["width"] = W
    torch.save(sd, os.path.join(str(ck), "depth_pose.pth"))
    return {"opt": opt, "ckpt": str(ck)}


@pytest.fixture(scope="module")
def ref_disps(tree, ref_setup):
    """Run the reference's own evaluate(); returns its saved pred_disps."""
    from dualrefine import evaluate_depth as ref_eval

    cwd = os.getcwd()
    os.chdir(tree["root"])  # splits_dir is relative in the reference
    try:
        with pytest.raises(SystemExit):  # --no_eval ends with quit()
            ref_eval.evaluate(ref_setup["opt"])
    finally:
        os.chdir(cwd)
    path = os.path.join(ref_setup["ckpt"], "multi_eigen_split.npy")
    return np.load(path)


@pytest.fixture(scope="module")
def our_disps(tree, ref_setup):
    from mal_tpu.config import Config
    from mal_tpu.convert.dualref import convert_dualrefine_checkpoint_dir
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.dualref.evaluate import infer_disparities_dualref
    from mal_tpu.dualref.model import DEQDepthPose

    params, stats, extras = convert_dualrefine_checkpoint_dir(
        ref_setup["ckpt"])
    cfg = Config(method="dualrefine", height=H, width=W, frame_ids=(0, -1),
                 batch_size=2, use_pallas=False)
    model = DEQDepthPose(cfg)
    ds = KITTIRAWDataset(tree["data"], tree["files"], H, W, (0, -1),
                         is_train=False, img_ext=".jpg")
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    return infer_disparities_dualref(
        model, {"params": params, "batch_stats": stats}, loader, cfg)


def test_dualref_disparities_match_reference(ref_disps, our_disps):
    """Per-pixel scaled-disparity parity of the full DualRefine eval path."""
    assert ref_disps.shape == our_disps.shape
    np.testing.assert_allclose(our_disps, ref_disps, atol=5e-4, rtol=1e-3)
