"""Eval post-processing: flip-averaging, prediction I/O, benchmark export.

Oracle: the reference's OWN `batch_post_process_disparity`
(`manydepth/evaluate_depth.py:56-63`), imported and executed directly.
"""

import numpy as np
import pytest

from mal_tpu.eval.postprocess import (STEREO_SCALE_FACTOR,
                                      export_benchmark_predictions,
                                      load_ext_disps, post_process_disparity,
                                      pred_disps_path, save_pred_disps)


def _reference_post_process():
    from tests.ref_oracle.stubs import install_reference_shims
    install_reference_shims()
    from manydepth.evaluate_depth import batch_post_process_disparity
    return batch_post_process_disparity


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_post_process_matches_reference(seed):
    rng = np.random.RandomState(seed)
    disp = rng.uniform(0.01, 0.4, size=(3, 24, 80)).astype(np.float64)
    disp_f = rng.uniform(0.01, 0.4, size=(3, 24, 80)).astype(np.float64)
    ref = _reference_post_process()(disp, disp_f)
    ours = post_process_disparity(disp, disp_f)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_post_process_edges_prefer_unoccluded_side():
    # at the left edge, only the flipped prediction contributes; at the
    # right edge, only the direct one
    disp = np.full((1, 8, 100), 2.0)
    disp_f = np.full((1, 8, 100), 4.0)
    out = post_process_disparity(disp, disp_f)
    assert np.allclose(out[0, :, 0], 4.0)
    assert np.allclose(out[0, :, -1], 2.0)
    # interior: plain mean
    assert np.allclose(out[0, :, 50], 3.0)


def test_save_load_roundtrip(tmp_path):
    disps = np.random.RandomState(0).rand(5, 6, 20).astype(np.float32)
    path = save_pred_disps(disps, str(tmp_path), "eigen")
    assert path == pred_disps_path(str(tmp_path), "eigen")
    assert path.endswith("multi_eigen_split.npy")
    out = load_ext_disps(path)
    np.testing.assert_array_equal(out, disps)
    # teacher / zero_cv tags (`dualrefine/evaluate_depth.py:202-208`)
    assert pred_disps_path(str(tmp_path), "eigen", eval_teacher=True) \
        .endswith("teacher_eigen_split.npy")
    assert pred_disps_path(str(tmp_path), "eigen", zero_cost_volume=True) \
        .endswith("zero_cv_eigen_split.npy")


def test_load_ext_disps_benchmark_reindex(tmp_path):
    disps = np.arange(4 * 2 * 3, dtype=np.float32).reshape(4, 2, 3)
    ids = np.array([2, 0])
    dp = tmp_path / "d.npy"
    ip = tmp_path / "ids.npy"
    np.save(dp, disps)
    np.save(ip, ids)
    out = load_ext_disps(str(dp), str(ip))
    np.testing.assert_array_equal(out, disps[[2, 0]])


def test_export_benchmark_predictions(tmp_path):
    from PIL import Image
    disps = np.full((2, 11, 38), 0.27, dtype=np.float32)
    n = export_benchmark_predictions(disps, str(tmp_path))
    assert n == 2
    img = np.asarray(Image.open(tmp_path / "0000000001.png"))
    assert img.shape == (352, 1216)
    assert img.dtype == np.uint16 or img.dtype == np.int32
    expect = np.uint16(np.clip(STEREO_SCALE_FACTOR / 0.27, 0, 80) * 256)
    assert abs(int(img[176, 608]) - int(expect)) <= 1
