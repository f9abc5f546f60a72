"""RAFT-utils parity: flow visualization, flow/disp file I/O, InputPadder.

Oracle: the reference's OWN `dualrefine/networks/utils/{flow_viz,
frame_utils,utils}.py`, imported and executed directly.
"""

import numpy as np
import pytest

from mal_tpu.dualref.raft_utils import (InputPadder, flow_to_image,
                                        forward_interpolate, make_colorwheel,
                                        read_disp_kitti, read_flo,
                                        read_flow_kitti, read_gen, read_pfm,
                                        write_flo, write_flow_kitti)
from tests.ref_oracle.stubs import install_reference_shims

install_reference_shims()


def _ref_flow_viz():
    from dualrefine.networks.utils import flow_viz
    return flow_viz


def _ref_frame_utils():
    from dualrefine.networks.utils import frame_utils
    return frame_utils


def test_colorwheel_matches_reference():
    ref = _ref_flow_viz().make_colorwheel()
    np.testing.assert_array_equal(make_colorwheel(), ref)


@pytest.mark.parametrize("seed,bgr", [(0, False), (1, False), (2, True)])
def test_flow_to_image_matches_reference(seed, bgr):
    rng = np.random.RandomState(seed)
    flow = rng.randn(17, 29, 2).astype(np.float32) * 5.0
    ref = _ref_flow_viz().flow_to_image(flow, convert_to_bgr=bgr)
    ours = flow_to_image(flow, convert_to_bgr=bgr)
    np.testing.assert_array_equal(ours, ref)


def test_flow_to_image_clip_matches_reference():
    rng = np.random.RandomState(3)
    flow = rng.randn(9, 13, 2).astype(np.float32) * 30.0
    ref = _ref_flow_viz().flow_to_image(flow, clip_flow=10.0)
    ours = flow_to_image(flow, clip_flow=10.0)
    np.testing.assert_array_equal(ours, ref)


def test_flo_roundtrip_cross_implementation(tmp_path):
    rng = np.random.RandomState(0)
    flow = rng.randn(12, 20, 2).astype(np.float32)
    # ours writes, reference reads
    ours_path = str(tmp_path / "a.flo")
    write_flo(ours_path, flow)
    ref_read = _ref_frame_utils().readFlow(ours_path)
    np.testing.assert_array_equal(np.asarray(ref_read), flow)
    # reference writes, ours reads
    ref_path = str(tmp_path / "b.flo")
    _ref_frame_utils().writeFlow(ref_path, flow)
    np.testing.assert_array_equal(read_flo(ref_path), flow)
    # read_gen dispatch
    np.testing.assert_array_equal(read_gen(ours_path), flow)


def test_pfm_matches_reference(tmp_path):
    rng = np.random.RandomState(1)
    data = rng.rand(7, 11).astype("<f4")
    path = tmp_path / "d.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(b"11 7\n")
        f.write(b"-1.0\n")
        f.write(np.flipud(data).tobytes())
    ref = _ref_frame_utils().readPFM(str(path))
    ours = read_pfm(str(path))
    np.testing.assert_array_equal(ours, np.asarray(ref))
    np.testing.assert_array_equal(ours, data)


def test_kitti_flow_roundtrip_matches_reference(tmp_path):
    rng = np.random.RandomState(2)
    flow = np.round(rng.randn(8, 10, 2) * 8.0 * 64.0) / 64.0  # representable
    path = str(tmp_path / "f.png")
    write_flow_kitti(path, flow.astype(np.float32))
    ref_flow, ref_valid = _ref_frame_utils().readFlowKITTI(path)
    ours_flow, ours_valid = read_flow_kitti(path)
    np.testing.assert_array_equal(ours_flow, ref_flow)
    np.testing.assert_array_equal(ours_valid, ref_valid)
    np.testing.assert_allclose(ours_flow, flow, atol=1e-6)
    assert np.all(ours_valid == 1)


def test_kitti_disp_matches_reference(tmp_path):
    import cv2
    disp = (np.random.RandomState(4).rand(6, 9) * 100 * 256).astype(np.uint16)
    path = str(tmp_path / "disp.png")
    cv2.imwrite(path, disp)
    ref_flow, ref_valid = _ref_frame_utils().readDispKITTI(path)
    ours_flow, ours_valid = read_disp_kitti(path)
    np.testing.assert_array_equal(ours_flow, np.asarray(ref_flow))
    np.testing.assert_array_equal(ours_valid, np.asarray(ref_valid))


@pytest.mark.parametrize("mode,shape", [("sintel", (2, 21, 30, 3)),
                                        ("kitti", (2, 21, 30, 3)),
                                        ("sintel", (16, 24, 1))])
def test_input_padder_matches_reference(mode, shape):
    import torch
    from dualrefine.networks.utils.utils import InputPadder as RefPadder

    rng = np.random.RandomState(5)
    x = rng.rand(*shape).astype(np.float32)
    chan_last = len(shape) >= 3
    # reference operates NCHW
    if len(shape) == 4:
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    else:
        xt = torch.from_numpy(x.transpose(2, 0, 1))[None]
    ref_padder = RefPadder(xt.shape, mode=mode)
    ref_padded = ref_padder.pad(xt)[0]
    ours_padder = InputPadder(x.shape, mode=mode)
    ours_padded = ours_padder.pad(x)[0]
    if len(shape) == 4:
        ref_np = ref_padded.numpy().transpose(0, 2, 3, 1)
    else:
        ref_np = ref_padded.numpy()[0].transpose(1, 2, 0)
    assert ours_padded.shape == ref_np.shape
    assert ours_padded.shape[-3] % 8 == 0 and ours_padded.shape[-2] % 8 == 0
    np.testing.assert_array_equal(ours_padded, ref_np)
    # unpad restores exactly
    np.testing.assert_array_equal(ours_padder.unpad(ours_padded), x)
    ref_unpad = ref_padder.unpad(ref_padded)
    np.testing.assert_array_equal(
        ref_unpad.numpy(),
        ref_padded.numpy()[..., ref_padder._pad[2]:ref_padded.shape[-2]
                           - ref_padder._pad[3],
                           ref_padder._pad[0]:ref_padded.shape[-1]
                           - ref_padder._pad[1]])


def test_forward_interpolate_matches_reference():
    import torch
    from dualrefine.networks.utils.utils import \
        forward_interpolate as ref_fi

    rng = np.random.RandomState(6)
    flow = rng.randn(2, 14, 18).astype(np.float32) * 2.0
    ref = np.asarray(ref_fi(torch.from_numpy(flow)))
    ours = forward_interpolate(flow)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
