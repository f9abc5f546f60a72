"""DualRefine checkpoint conversion: `depth_pose.pth` -> flax pytrees.

The reference ships DualRefine as a single state dict with 4 depth-bin
stats and height/width keys (`dualrefine/evaluate_depth.py:105-125`).
Attribute layout (`dualrefine/networks/depth_pose.py:24-172`):

  cnet_layer0a/0b      HRNet stem convs (Sequential(conv, bn, relu))
  cnet_layer1          4 Bottlenecks (stage 1)
  cnet_transition{1,2,3}, cnet_stage{2,3,4}   HRNet-W18 trunk
  decoder.convs.{72,36,18,9,up_x9_0,up_x9_1,dispConvScale0..3}
  conv2 / context / hidden     instance-norm ResidualBlock + 3x3 conv heads
  update_block                 SmallUpdateBlock, weight-normalized convs
  pnets.{0,1,2}                3 pose nets (resnet18 multi-image + conv head)
  pose_update                  uncertainty head (batch-norm ResidualBlocks)
  reproject_2.delta / delta_p  learnable epipolar gap scales

Target: `mal_tpu.dualref.model.DEQDepthPose` params/batch_stats.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from mal_tpu.convert.torch_weights import (
    _bn,
    _conv,
    _take,
    convert_resnet_trunk,
    load_pth,
)


def _linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense kernel (I, O)."""
    return np.transpose(w, (1, 0))


def _conv_plain(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _conv(_take(sd, prefix + ".weight"))}
    if bias:
        out["bias"] = _take(sd, prefix + ".bias")
    return out


def _wnconv(sd: Mapping, prefix: str) -> dict:
    """torch weight_norm(dim=0) conv -> WNConv {v, g, bias}.

    weight_g is (O,1,1,1); weight_v is (O,I,kh,kw). Falls back to a plain
    `weight` (g = per-channel norm of v, so g*v/||v|| reproduces w exactly)
    when the checkpoint was saved with --disable_wnorm.
    """
    if prefix + ".weight_g" in sd:
        v = _take(sd, prefix + ".weight_v")
        g = _take(sd, prefix + ".weight_g").reshape(-1)
    else:
        v = _take(sd, prefix + ".weight")
        g = np.sqrt((v * v).sum(axis=(1, 2, 3)) + 1e-12)
    return {"v": _conv(v), "g": g, "bias": _take(sd, prefix + ".bias")}


def _convbn(sd: Mapping, conv_key: str, bn_key: str) -> tuple[dict, dict]:
    """(conv weight, BN) pair -> our `_ConvBN` {conv, bn} params + stats."""
    bn_p, bn_s = _bn(sd, bn_key)
    return ({"conv": {"kernel": _conv(_take(sd, conv_key + ".weight"))},
             "bn": bn_p}, {"bn": bn_s})


def _basic_block(sd: Mapping, prefix: str) -> tuple[dict, dict]:
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}
    for ci in (1, 2):
        p[f"conv{ci}"] = {"kernel": _conv(_take(sd, f"{prefix}.conv{ci}.weight"))}
        p[f"bn{ci}"], s[f"bn{ci}"] = _bn(sd, f"{prefix}.bn{ci}")
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = {
            "kernel": _conv(_take(sd, f"{prefix}.downsample.0.weight"))}
        p["downsample_bn"], s["downsample_bn"] = _bn(
            sd, f"{prefix}.downsample.1")
    return p, s


def _bottleneck(sd: Mapping, prefix: str) -> tuple[dict, dict]:
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}
    for ci in (1, 2, 3):
        p[f"conv{ci}"] = {"kernel": _conv(_take(sd, f"{prefix}.conv{ci}.weight"))}
        p[f"bn{ci}"], s[f"bn{ci}"] = _bn(sd, f"{prefix}.bn{ci}")
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample_conv"] = {
            "kernel": _conv(_take(sd, f"{prefix}.downsample.0.weight"))}
        p["downsample_bn"], s["downsample_bn"] = _bn(
            sd, f"{prefix}.downsample.1")
    return p, s


_STAGE_LAYOUT = {2: (1, 2), 3: (4, 3), 4: (3, 4)}  # stage: (modules, branches)


def convert_hrnet_trunk(sd: Mapping[str, np.ndarray],
                        prefix: str = "cnet_") -> tuple[dict, dict]:
    """`DepthPose.cnet_*` keys -> our `HRNet` (params, batch_stats).

    HRNet-W18 layout (`hrnet_config.py` HRNET_18): stage modules (1, 4, 3),
    4 BasicBlocks per branch, SUM fusion.
    """
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}

    # stem: layer0a = Sequential(conv1, bn1, relu), layer0b likewise
    p["stem1"], s["stem1"] = _convbn(sd, f"{prefix}layer0a.0", f"{prefix}layer0a.1")
    p["stem2"], s["stem2"] = _convbn(sd, f"{prefix}layer0b.0", f"{prefix}layer0b.1")

    for b in range(4):
        p[f"layer1_{b}"], s[f"layer1_{b}"] = _bottleneck(
            sd, f"{prefix}layer1.{b}")

    # transitions: index i < pre-branches gets Sequential(conv, bn, relu) when
    # channels change; the new lowest branch is a nested Sequential
    # (`hr_encoder.py:359-392`)
    p["trans1_0"], s["trans1_0"] = _convbn(
        sd, f"{prefix}transition1.0.0", f"{prefix}transition1.0.1")
    p["trans1_1"], s["trans1_1"] = _convbn(
        sd, f"{prefix}transition1.1.0.0", f"{prefix}transition1.1.0.1")
    p["trans2_2"], s["trans2_2"] = _convbn(
        sd, f"{prefix}transition2.2.0.0", f"{prefix}transition2.2.0.1")
    p["trans3_3"], s["trans3_3"] = _convbn(
        sd, f"{prefix}transition3.3.0.0", f"{prefix}transition3.3.0.1")

    for stage, (n_mod, n_br) in _STAGE_LAYOUT.items():
        for m in range(n_mod):
            mp: dict[str, Any] = {}
            ms: dict[str, Any] = {}
            base = f"{prefix}stage{stage}.{m}"
            for i in range(n_br):
                for b in range(4):
                    mp[f"branch{i}_block{b}"], ms[f"branch{i}_block{b}"] = \
                        _basic_block(sd, f"{base}.branches.{i}.{b}")
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        mp[f"fuse{i}_{j}"], ms[f"fuse{i}_{j}"] = _convbn(
                            sd, f"{base}.fuse_layers.{i}.{j}.0",
                            f"{base}.fuse_layers.{i}.{j}.1")
                    elif j < i:
                        for k in range(i - j):
                            mp[f"fuse{i}_{j}_{k}"], ms[f"fuse{i}_{j}_{k}"] = \
                                _convbn(sd, f"{base}.fuse_layers.{i}.{j}.{k}.0",
                                        f"{base}.fuse_layers.{i}.{j}.{k}.1")
            p[f"stage{stage}_m{m}"] = mp
            s[f"stage{stage}_m{m}"] = ms
    return p, s


def _attention_module(sd: Mapping, prefix: str) -> dict:
    """`Attention_Module` (`dualrefine/layers.py:434-475`): ChannelAttention
    (2 bias-free Linears) + 3x3 conv_se."""
    return {
        "ca": {"fc1": {"kernel": _linear(_take(sd, prefix + ".ca.fc.0.weight"))},
               "fc2": {"kernel": _linear(_take(sd, prefix + ".ca.fc.2.weight"))}},
        "conv_se": _conv_plain(sd, prefix + ".conv_se"),
    }


def convert_hr_decoder(sd: Mapping[str, np.ndarray],
                       prefix: str = "decoder.convs.") -> dict:
    """`HRDepthDecoder.convs` ModuleDict -> our `HRDepthDecoder` params.

    The reference also aliases every module under `decoder.decoder.N`
    (an extra ModuleList over the same objects, `hr_depth_decoder.py:42`);
    those duplicate tensors are ignored.
    """
    p: dict[str, Any] = {}
    for tag, name in (("72", "att72"), ("36", "att36"),
                      ("18", "att18"), ("9", "att9")):
        p[name] = _attention_module(sd, prefix + tag)
    for name in ("up_x9_0", "up_x9_1"):
        p[name] = {"conv": _conv_plain(sd, f"{prefix}{name}.conv.conv")}
    for i in range(4):
        p[f"dispConvScale{i}"] = {
            "conv": _conv_plain(sd, f"{prefix}dispConvScale{i}.conv")}
    return p


def _feat_head(sd: Mapping, prefix: str) -> dict:
    """Instance-norm ResidualBlock + 3x3 conv head (`depth_pose.py:141-151`).
    InstanceNorm2d carries no parameters, so only the 4 convs map."""
    return {
        "res": {"conv1": _conv_plain(sd, prefix + ".0.conv1"),
                "conv2": _conv_plain(sd, prefix + ".0.conv2")},
        "out": _conv_plain(sd, prefix + ".1"),
    }


def convert_update_block(sd: Mapping[str, np.ndarray],
                         prefix: str = "update_block.") -> dict:
    """`SmallUpdateBlock` (`dualrefine/networks/update.py:128-163`), with
    weight-normalized encoder/GRU/delta-head convs. The unused pose MLP
    (`convp1/convp2`, `update.py:97-98` — never called in forward) is
    dropped."""
    enc = {name: _wnconv(sd, f"{prefix}encoder.{name}")
           for name in ("convc1", "convc2", "convf1", "convf2", "conv")}
    gru = {name: _wnconv(sd, f"{prefix}gru.{name}")
           for name in ("conv_net", "conv_inp", "w", "convz_glo",
                        "convr_glo", "convq_glo", "convq")}
    p: dict[str, Any] = {"encoder": enc, "gru": gru}
    p["head_conv1"] = _wnconv(sd, f"{prefix}conv_head.conv1")
    p["head_conv2"] = _wnconv(sd, f"{prefix}conv_head.conv2")
    p["mask_conv1"] = _conv_plain(sd, f"{prefix}mask.0")
    p["mask_conv2"] = _conv_plain(sd, f"{prefix}mask.2")
    if f"{prefix}weight.0.weight" in sd:
        p["weight_conv1"] = _conv_plain(sd, f"{prefix}weight.0")
        p["weight_conv2"] = _conv_plain(sd, f"{prefix}weight.2")
    return p


def convert_pose_weights(sd: Mapping[str, np.ndarray],
                         prefix: str = "pose_update.") -> tuple[dict, dict]:
    """`PoseUpdate.weights` = Sequential(2 batch-norm ResidualBlocks,
    1x1 bias-free conv, ReLU) (`utils/utils.py:272-276`). The unused `feats`
    head and the orphan `norm1` are dropped."""
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}
    for blk, tp in (("blk1", f"{prefix}weights.0.0"),
                    ("blk2", f"{prefix}weights.0.1")):
        bp: dict[str, Any] = {}
        bs: dict[str, Any] = {}
        for ci in (1, 2):
            bp[f"conv{ci}"] = _conv_plain(sd, f"{tp}.conv{ci}")
            bp[f"norm{ci}"], bs[f"norm{ci}"] = _bn(sd, f"{tp}.norm{ci}")
        p[blk] = bp
        s[blk] = bs
    p["out"] = {"kernel": _conv(_take(sd, f"{prefix}weights.1.weight"))}
    return p, s


def convert_depth_pose(sd: Mapping[str, np.ndarray]):
    """Full `depth_pose.pth` state dict -> (params, batch_stats, extras)
    for `mal_tpu.dualref.model.DEQDepthPose`."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    params["cnet"], stats["cnet"] = convert_hrnet_trunk(sd)
    params["decoder"] = convert_hr_decoder(sd)
    for name in ("conv2", "context", "hidden"):
        params[name] = _feat_head(sd, name)
    params["update_block"] = convert_update_block(sd)
    params["pose_weights"], stats["pose_weights"] = convert_pose_weights(sd)
    params["reproject_2"] = {"delta": _take(sd, "reproject_2.delta")}
    if "reproject_2.delta_p" in sd:
        params["reproject_2"]["delta_p"] = _take(sd, "reproject_2.delta_p")

    for side in range(3):
        tp, ts = convert_resnet_trunk(
            {k[len(f"pnets.{side}.0."):]: v for k, v in sd.items()
             if k.startswith(f"pnets.{side}.0.")}, 18)
        params[f"pose_trunk_{side}"] = tp
        stats[f"pose_trunk_{side}"] = ts
        head = {k[len(f"pnets.{side}.1."):]: v for k, v in sd.items()
                if k.startswith(f"pnets.{side}.1.")}
        params[f"pose_head_{side}"] = {
            "squeeze": _conv_plain(head, "squeeze"),
            "pose_0": _conv_plain(head, "pose0"),
            "pose_1": _conv_plain(head, "pose1"),
            "pose_2": _conv_plain(head, "pose2"),
        }

    extras = {k: np.asarray(sd[k]) for k in
              ("min_depth_bin", "max_depth_bin", "mean_depth_bin",
               "median_depth_bin", "height", "width") if k in sd}
    return params, stats, extras


def convert_dualrefine_checkpoint_dir(folder: str):
    """Reference checkpoint dir with `depth_pose.pth`
    (`dualrefine/evaluate_depth.py:105-119`)."""
    sd = load_pth(os.path.join(folder, "depth_pose.pth"))
    return convert_depth_pose(sd)
