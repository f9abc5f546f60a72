"""DualRefine reverse converter: DEQDepthPose pytrees -> `depth_pose.pth`.

Round-trip gate against `convert_depth_pose` (itself oracle-tested against
the reference's own eval, tests/test_ref_oracle_dualref.py), plus key-set
coverage against the full torch twin state dict from
tests/test_convert_dualref.py — proving the exported file satisfies the
reference eval's filtered-strict `load_state_dict`
(`dualrefine/evaluate_depth.py:144`).
"""

import numpy as np
import pytest
import torch
from torch import nn

from mal_tpu.convert.dualref import convert_depth_pose
from mal_tpu.convert.export_dualref import (PLACEHOLDER_KEYS,
                                            export_depth_pose,
                                            export_dualrefine_checkpoint_dir)

from test_convert_dualref import (THRDecoder, THRNet18, TPoseTrunk,
                                  TResBlockBN, TResBlockIN, TUpdateBlock)


def _build_full_twin():
    """The complete depth_pose twin (same assembly as
    test_full_depth_pose_conversion_structure)."""
    torch.manual_seed(12)
    full = THRNet18()
    full.decoder = nn.Module()
    full.decoder.convs = THRDecoder().convs
    full.conv2 = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    full.context = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    full.hidden = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    ub = TUpdateBlock()
    ub.wnorm()
    full.update_block = ub
    pu = nn.Module()
    pu.norm1 = nn.BatchNorm2d(64)
    pu.weights = nn.Sequential(
        nn.Sequential(TResBlockBN(64), TResBlockBN(64)),
        nn.Conv2d(64, 1, 1, bias=False), nn.ReLU())
    full.pose_update = pu
    full.reproject_2 = nn.Module()
    full.reproject_2.delta = nn.Parameter(torch.ones(1) * 0.3)
    full.reproject_2.delta_p = nn.Parameter(torch.ones(1) * 0.7)
    pnets = nn.ModuleList()
    for _ in range(3):
        trunk = TPoseTrunk()
        convs = nn.ModuleDict({
            "squeeze": nn.Conv2d(512, 256, 1),
            "pose0": nn.Conv2d(256, 256, 3, 1, 1),
            "pose1": nn.Conv2d(256, 256, 3, 1, 1),
            "pose2": nn.Conv2d(256, 6, 1)})
        pnets.append(nn.ModuleList([trunk, convs]))
    full.pnets = pnets
    return full


def test_export_dualref_roundtrip_and_coverage(tmp_path):
    full = _build_full_twin()
    sd = {k: v.detach().numpy() for k, v in full.state_dict().items()}
    params, stats, _ = convert_depth_pose(sd)

    extras = {"min_depth_bin": 0.1, "max_depth_bin": 10.0,
              "mean_depth_bin": 3.0, "median_depth_bin": 2.5,
              "height": 64, "width": 96}
    path = export_dualrefine_checkpoint_dir(params, stats, str(tmp_path),
                                            extras)
    sd2 = {k: v.numpy() for k, v in
           torch.load(path, weights_only=False).items()}

    # 1) key coverage: every twin key exists with the same shape. The only
    # exception is the dead pose MLP (convp1/convp2): the twin stores it as
    # a plain Linear while the REFERENCE weight-norms it
    # (`update.py:99-100`), which is what the export emits.
    for k, v in sd.items():
        if ".encoder.convp" in k:
            stem = k.rsplit(".", 1)[0]
            assert stem + ".weight_v" in sd2 or k.endswith(".bias"), k
            continue
        assert k in sd2, f"missing exported key {k}"
        if not k.endswith("num_batches_tracked"):
            assert sd2[k].shape == tuple(v.shape), k

    # 2) bit-exact round-trip through the (oracle-tested) forward converter
    params2, stats2, extras2 = convert_depth_pose(sd2)
    import jax

    got = {jax.tree_util.keystr(k): v
           for k, v in jax.tree_util.tree_flatten_with_path(params2)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(got[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k))
    got_s = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_flatten_with_path(stats2)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(stats)[0]:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(got_s[jax.tree_util.keystr(k)]))
    for k, want in extras.items():
        np.testing.assert_allclose(float(np.asarray(extras2[k])), want)

    # 3) decoder ModuleList aliases present and identical to their
    # ModuleDict twins (`hr_depth_decoder.py:42` order)
    np.testing.assert_array_equal(sd2["decoder.decoder.0.conv.conv.weight"],
                                  sd2["decoder.convs.up_x9_0.conv.conv.weight"])
    np.testing.assert_array_equal(sd2["decoder.decoder.2.conv_se.weight"],
                                  sd2["decoder.convs.72.conv_se.weight"])
    np.testing.assert_array_equal(sd2["decoder.decoder.6.conv.weight"],
                                  sd2["decoder.convs.dispConvScale0.conv.weight"])

    # 4) placeholders are declared
    assert any("convp1" in k for k in PLACEHOLDER_KEYS)
    assert any("feats" in k for k in PLACEHOLDER_KEYS)
