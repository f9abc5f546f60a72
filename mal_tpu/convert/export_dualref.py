"""Reverse conversion: DEQDepthPose flax pytrees -> `depth_pose.pth`.

The inverse of `convert/dualref.py`: a DualRefine model trained in mal_tpu
exports to the reference's single-state-dict layout
(`dualrefine/evaluate_depth.py:105-149` — the eval filters the checkpoint to
the model's keys and then loads strict, so every model key must be present).
Keys the reference model OWNS but never executes are emitted as
shape-correct placeholders and flagged in `PLACEHOLDER_KEYS`:

- `update_block.encoder.convp1/convp2` — the dead pose MLP
  (`update.py:97-98`; its forward use is commented out at `update.py:118-119`)
- `pose_update.feats` — an unused feature head (`utils/utils.py:276-278`)
- `pose_update.norm1` — an orphan BatchNorm (`utils/utils.py:265`)

The decoder ModuleList aliases (`decoder.decoder.N` — the same modules the
ModuleDict holds, re-registered at `hr_depth_decoder.py:42`) are emitted
too, pointing at identical tensors.

Round-trip tested bit-exactly (tests/test_export_dualref.py):
export -> `convert_depth_pose` -> identical pytree, and the exported key set
covers the torch twin's full `state_dict()`.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from mal_tpu.convert.export_pth import _conv_inv

# decoder.decoder ModuleList insertion order (`hr_depth_decoder.py:33-42`)
_DECODER_ALIAS_ORDER = ("up_x9_0", "up_x9_1", "72", "36", "18", "9",
                        "dispConvScale0", "dispConvScale1",
                        "dispConvScale2", "dispConvScale3")

PLACEHOLDER_KEYS: list[str] = []  # filled per export call


def _linear_inv(k: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(k), (1, 0))


def _put_bn(sd: dict, prefix: str, p: Mapping, s: Mapping):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])
    sd[prefix + ".running_mean"] = np.asarray(s["mean"])
    sd[prefix + ".running_var"] = np.asarray(s["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _put_identity_bn(sd: dict, prefix: str, ch: int):
    sd[prefix + ".weight"] = np.ones(ch, np.float32)
    sd[prefix + ".bias"] = np.zeros(ch, np.float32)
    sd[prefix + ".running_mean"] = np.zeros(ch, np.float32)
    sd[prefix + ".running_var"] = np.ones(ch, np.float32)
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _put_conv(sd: dict, prefix: str, p: Mapping, bias: bool = True):
    sd[prefix + ".weight"] = _conv_inv(p["kernel"])
    if bias:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _put_convbn(sd: dict, conv_key: str, bn_key: str, p: Mapping, s: Mapping):
    sd[conv_key + ".weight"] = _conv_inv(p["conv"]["kernel"])
    _put_bn(sd, bn_key, p["bn"], s["bn"])


def _put_block(sd: dict, prefix: str, p: Mapping, s: Mapping, n_convs: int):
    """BasicBlock (2 convs) / Bottleneck (3 convs), bias-free convs + BN."""
    for ci in range(1, n_convs + 1):
        sd[f"{prefix}.conv{ci}.weight"] = _conv_inv(p[f"conv{ci}"]["kernel"])
        _put_bn(sd, f"{prefix}.bn{ci}", p[f"bn{ci}"], s[f"bn{ci}"])
    if "downsample_conv" in p:
        sd[f"{prefix}.downsample.0.weight"] = _conv_inv(
            p["downsample_conv"]["kernel"])
        _put_bn(sd, f"{prefix}.downsample.1", p["downsample_bn"],
                s["downsample_bn"])


def _put_wnconv(sd: dict, prefix: str, p: Mapping):
    """WNConv {v, g, bias} -> torch weight_norm(dim=0) conv key pair."""
    sd[prefix + ".weight_v"] = _conv_inv(p["v"])
    sd[prefix + ".weight_g"] = np.asarray(p["g"]).reshape(-1, 1, 1, 1)
    sd[prefix + ".bias"] = np.asarray(p["bias"])


_STAGE_LAYOUT = {2: (1, 2), 3: (4, 3), 4: (3, 4)}  # stage: (modules, branches)


def export_hrnet_trunk(p: Mapping, s: Mapping,
                       prefix: str = "cnet_") -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    _put_convbn(sd, f"{prefix}layer0a.0", f"{prefix}layer0a.1",
                p["stem1"], s["stem1"])
    _put_convbn(sd, f"{prefix}layer0b.0", f"{prefix}layer0b.1",
                p["stem2"], s["stem2"])
    for b in range(4):
        _put_block(sd, f"{prefix}layer1.{b}", p[f"layer1_{b}"],
                   s[f"layer1_{b}"], n_convs=3)
    _put_convbn(sd, f"{prefix}transition1.0.0", f"{prefix}transition1.0.1",
                p["trans1_0"], s["trans1_0"])
    _put_convbn(sd, f"{prefix}transition1.1.0.0", f"{prefix}transition1.1.0.1",
                p["trans1_1"], s["trans1_1"])
    _put_convbn(sd, f"{prefix}transition2.2.0.0", f"{prefix}transition2.2.0.1",
                p["trans2_2"], s["trans2_2"])
    _put_convbn(sd, f"{prefix}transition3.3.0.0", f"{prefix}transition3.3.0.1",
                p["trans3_3"], s["trans3_3"])
    for stage, (n_mod, n_br) in _STAGE_LAYOUT.items():
        for m in range(n_mod):
            mp, ms = p[f"stage{stage}_m{m}"], s[f"stage{stage}_m{m}"]
            base = f"{prefix}stage{stage}.{m}"
            for i in range(n_br):
                for b in range(4):
                    _put_block(sd, f"{base}.branches.{i}.{b}",
                               mp[f"branch{i}_block{b}"],
                               ms[f"branch{i}_block{b}"], n_convs=2)
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        _put_convbn(sd, f"{base}.fuse_layers.{i}.{j}.0",
                                    f"{base}.fuse_layers.{i}.{j}.1",
                                    mp[f"fuse{i}_{j}"], ms[f"fuse{i}_{j}"])
                    elif j < i:
                        for k in range(i - j):
                            _put_convbn(
                                sd, f"{base}.fuse_layers.{i}.{j}.{k}.0",
                                f"{base}.fuse_layers.{i}.{j}.{k}.1",
                                mp[f"fuse{i}_{j}_{k}"], ms[f"fuse{i}_{j}_{k}"])
    return sd


def _export_attention(sd: dict, prefix: str, p: Mapping):
    sd[prefix + ".ca.fc.0.weight"] = _linear_inv(p["ca"]["fc1"]["kernel"])
    sd[prefix + ".ca.fc.2.weight"] = _linear_inv(p["ca"]["fc2"]["kernel"])
    _put_conv(sd, prefix + ".conv_se", p["conv_se"])


def export_hr_decoder(p: Mapping,
                      prefix: str = "decoder.convs.") -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    for tag, name in (("72", "att72"), ("36", "att36"),
                      ("18", "att18"), ("9", "att9")):
        _export_attention(sd, prefix + tag, p[name])
    for name in ("up_x9_0", "up_x9_1"):
        _put_conv(sd, f"{prefix}{name}.conv.conv", p[name]["conv"])
    for i in range(4):
        _put_conv(sd, f"{prefix}dispConvScale{i}.conv",
                  p[f"dispConvScale{i}"]["conv"])
    return sd


def _export_feat_head(sd: dict, prefix: str, p: Mapping):
    _put_conv(sd, prefix + ".0.conv1", p["res"]["conv1"])
    _put_conv(sd, prefix + ".0.conv2", p["res"]["conv2"])
    _put_conv(sd, prefix + ".1", p["out"])


def export_update_block(p: Mapping,
                        prefix: str = "update_block.") -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    for name in ("convc1", "convc2", "convf1", "convf2", "conv"):
        _put_wnconv(sd, f"{prefix}encoder.{name}", p["encoder"][name])
    for name in ("conv_net", "conv_inp", "w", "convz_glo",
                 "convr_glo", "convq_glo", "convq"):
        _put_wnconv(sd, f"{prefix}gru.{name}", p["gru"][name])
    _put_wnconv(sd, f"{prefix}conv_head.conv1", p["head_conv1"])
    _put_wnconv(sd, f"{prefix}conv_head.conv2", p["head_conv2"])
    _put_conv(sd, f"{prefix}mask.0", p["mask_conv1"])
    _put_conv(sd, f"{prefix}mask.2", p["mask_conv2"])
    if "weight_conv1" in p:
        _put_conv(sd, f"{prefix}weight.0", p["weight_conv1"])
        _put_conv(sd, f"{prefix}weight.2", p["weight_conv2"])
    # the dead pose MLP (`update.py:97-98`, forward use commented out) —
    # shape-correct weight-normed zeros so the reference's strict load passes
    for name, (o, i) in (("convp1", (128, 6)), ("convp2", (128, 128))):
        sd[f"{prefix}encoder.{name}.weight_v"] = np.zeros((o, i), np.float32)
        sd[f"{prefix}encoder.{name}.weight_g"] = np.ones((o, 1), np.float32)
        sd[f"{prefix}encoder.{name}.bias"] = np.zeros(o, np.float32)
        PLACEHOLDER_KEYS.append(f"{prefix}encoder.{name}")
    return sd


def export_pose_weights(p: Mapping, s: Mapping,
                        prefix: str = "pose_update.",
                        ch: int = 64) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    for blk, tp in (("blk1", f"{prefix}weights.0.0"),
                    ("blk2", f"{prefix}weights.0.1")):
        for ci in (1, 2):
            _put_conv(sd, f"{tp}.conv{ci}", p[blk][f"conv{ci}"])
            _put_bn(sd, f"{tp}.norm{ci}", p[blk][f"norm{ci}"],
                    s[blk][f"norm{ci}"])
    sd[f"{prefix}weights.1.weight"] = _conv_inv(p["out"]["kernel"])

    # unused modules the reference model still owns (`utils/utils.py:265,
    # 276-278`): orphan norm1 + the feats head — identity/zero placeholders
    _put_identity_bn(sd, f"{prefix}norm1", ch)
    PLACEHOLDER_KEYS.append(f"{prefix}norm1")
    for tp in (f"{prefix}feats.0.0", f"{prefix}feats.0.1"):
        for ci in (1, 2):
            sd[f"{tp}.conv{ci}.weight"] = np.zeros((ch, ch, 3, 3), np.float32)
            sd[f"{tp}.conv{ci}.bias"] = np.zeros(ch, np.float32)
            _put_identity_bn(sd, f"{tp}.norm{ci}", ch)
    sd[f"{prefix}feats.1.weight"] = np.zeros((16, ch, 1, 1), np.float32)
    PLACEHOLDER_KEYS.append(f"{prefix}feats")
    return sd


def export_depth_pose(params: Mapping, stats: Mapping,
                      extras: Mapping | None = None) -> dict[str, np.ndarray]:
    """Full DEQDepthPose pytree -> `depth_pose.pth` state dict (numpy)."""
    from mal_tpu.convert.export_pth import export_resnet_trunk

    PLACEHOLDER_KEYS.clear()
    sd: dict[str, np.ndarray] = {}
    sd.update(export_hrnet_trunk(params["cnet"], stats["cnet"]))
    dec = export_hr_decoder(params["decoder"])
    sd.update(dec)
    # ModuleList aliases over the same modules (`hr_depth_decoder.py:42`)
    for n, tag in enumerate(_DECODER_ALIAS_ORDER):
        pre = f"decoder.convs.{tag}."
        for k, v in dec.items():
            if k.startswith(pre):
                sd[f"decoder.decoder.{n}." + k[len(pre):]] = v
    for name in ("conv2", "context", "hidden"):
        _export_feat_head(sd, name, params[name])
    sd.update(export_update_block(params["update_block"]))
    sd.update(export_pose_weights(params["pose_weights"],
                                  stats["pose_weights"]))
    sd["reproject_2.delta"] = np.asarray(params["reproject_2"]["delta"])
    if "delta_p" in params["reproject_2"]:
        sd["reproject_2.delta_p"] = np.asarray(
            params["reproject_2"]["delta_p"])
    for side in range(3):
        trunk = export_resnet_trunk(params[f"pose_trunk_{side}"],
                                    stats[f"pose_trunk_{side}"], 18,
                                    prefix=f"pnets.{side}.0.")
        # torchvision's classifier head: ResNetMultiImageInput inherits it
        # (`resnet_encoder.py:23-29`), never executed — zero placeholders so
        # the filtered-strict eval load passes
        trunk[f"pnets.{side}.0.fc.weight"] = np.zeros((1000, 512), np.float32)
        trunk[f"pnets.{side}.0.fc.bias"] = np.zeros(1000, np.float32)
        sd.update(trunk)
        head = params[f"pose_head_{side}"]
        for our, ref in (("squeeze", "squeeze"), ("pose_0", "pose0"),
                         ("pose_1", "pose1"), ("pose_2", "pose2")):
            _put_conv(sd, f"pnets.{side}.1.{ref}", head[our])
    if extras:
        for k in ("min_depth_bin", "max_depth_bin", "mean_depth_bin",
                  "median_depth_bin", "height", "width"):
            if k in extras:
                sd[k] = np.asarray(extras[k])
    return sd


def export_dualrefine_checkpoint_dir(params: Mapping, stats: Mapping,
                                     folder: str,
                                     extras: Mapping | None = None) -> str:
    """Write `depth_pose.pth` in the reference layout; returns the path."""
    import torch

    os.makedirs(folder, exist_ok=True)
    sd = export_depth_pose(params, stats, extras)
    path = os.path.join(folder, "depth_pose.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    return path
