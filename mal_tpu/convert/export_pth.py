"""Reverse conversion: mal_tpu flax pytrees -> reference `.pth` layouts.

The inverse of `convert/torch_weights.py`, closing the interop loop: a model
trained in mal_tpu can be saved in the exact per-net checkpoint layout the
reference consumes (`manydepth/networks/repdepth.py:76-99` load_manydepth,
`manydepth/evaluate_depth.py:324-365`), so the reference's own training and
eval tooling can ingest mal-trained weights. Round-trip tested bit-exactly
(tests/test_export_pth.py): export -> `convert_mal_checkpoint_dir` ->
identical pytree.

Layout conventions reversed:
- flax kernel (kh, kw, I, O) -> torch conv (O, I, kh, kw)
- BatchNorm scale/bias -> weight/bias; batch_stats mean/var ->
  running_mean/running_var (+ `num_batches_tracked=0`, which torch state
  dicts carry and the forward converter ignores)
- our `ResNetFeatures` naming -> torchvision (`conv1`, `bn1`, `layerN.M.*`)
  and the matching encoder's Sequential wrapping (`layer0.0`, `layer1.1`,
  `resnet_encoder.py:106-110`)
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

from mal_tpu.convert.torch_weights import _LAYER_BLOCKS


def _conv_inv(k: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(k), (3, 2, 0, 1))


def _bn_inv(sd: dict, prefix: str, params: Mapping, stats: Mapping):
    sd[prefix + ".weight"] = np.asarray(params["scale"])
    sd[prefix + ".bias"] = np.asarray(params["bias"])
    sd[prefix + ".running_mean"] = np.asarray(stats["mean"])
    sd[prefix + ".running_var"] = np.asarray(stats["var"])
    sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def export_resnet_trunk(params: Mapping, stats: Mapping,
                        num_layers: int = 18,
                        prefix: str = "") -> dict[str, np.ndarray]:
    """`ResNetFeatures` params -> torchvision resnet state-dict keys."""
    sd: dict[str, np.ndarray] = {}
    sd[prefix + "conv1.weight"] = _conv_inv(params["conv1"]["kernel"])
    _bn_inv(sd, prefix + "bn1", params["bn1"], stats["bn1"])
    n_convs = 3 if num_layers >= 50 else 2
    for layer in range(1, 5):
        for block in range(_LAYER_BLOCKS[num_layers][layer - 1]):
            name = f"layer{layer}_{block}"
            tpre = f"{prefix}layer{layer}.{block}."
            bp, bs = params[name], stats[name]
            for ci in range(1, n_convs + 1):
                sd[tpre + f"conv{ci}.weight"] = _conv_inv(
                    bp[f"conv{ci}"]["kernel"])
                _bn_inv(sd, tpre + f"bn{ci}", bp[f"bn{ci}"], bs[f"bn{ci}"])
            if "downsample_conv" in bp:
                sd[tpre + "downsample.0.weight"] = _conv_inv(
                    bp["downsample_conv"]["kernel"])
                _bn_inv(sd, tpre + "downsample.1", bp["downsample_bn"],
                        bs["downsample_bn"])
    return sd


def export_matching_encoder(params: Mapping, stats: Mapping,
                            extras: Mapping | None = None,
                            num_layers: int = 18) -> dict[str, np.ndarray]:
    """Inverse of `convert_matching_encoder`: `ResnetEncoderMatching`'s
    Sequential key layout (`resnet_encoder.py:106-110`) + depth bins."""
    flat = export_resnet_trunk(params["encoder"], stats["encoder"],
                               num_layers)
    sd: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if k.startswith("conv1."):
            sd["layer0.0." + k[len("conv1."):]] = v
        elif k.startswith("bn1."):
            sd["layer0.1." + k[len("bn1."):]] = v
        elif k.startswith("layer1."):
            sd["layer1.1." + k[len("layer1."):]] = v
        else:
            sd[k] = v
    sd["reduce_conv.0.weight"] = _conv_inv(params["reduce_conv"]["kernel"])
    sd["reduce_conv.0.bias"] = np.asarray(params["reduce_conv"]["bias"])
    for k in ("min_depth_bin", "max_depth_bin"):
        if extras and k in extras:
            sd[k] = np.asarray(extras[k])
    return sd


def export_depth_decoder(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of `convert_depth_decoder` (`depth_decoder.py:29-50`)."""
    sd: dict[str, np.ndarray] = {}
    for idx, i in enumerate(range(4, -1, -1)):
        for j in (0, 1):
            li = 2 * idx + j
            c = params[f"upconv_{i}_{j}"]["conv"]
            sd[f"decoder.{li}.conv.conv.weight"] = _conv_inv(c["kernel"])
            sd[f"decoder.{li}.conv.conv.bias"] = np.asarray(c["bias"])
    sd["decoder.10.conv.weight"] = _conv_inv(
        params["dispconv_0"]["conv"]["kernel"])
    sd["decoder.10.conv.bias"] = np.asarray(
        params["dispconv_0"]["conv"]["bias"])
    return sd


def export_pose_decoder(params: Mapping) -> dict[str, np.ndarray]:
    """Inverse of `convert_pose_decoder` (`pose_decoder.py:23-31`)."""
    sd: dict[str, np.ndarray] = {}
    for i, name in enumerate(["squeeze", "pose_0", "pose_1", "pose_2"]):
        sd[f"net.{i}.weight"] = _conv_inv(params[name]["kernel"])
        sd[f"net.{i}.bias"] = np.asarray(params[name]["bias"])
    return sd


def export_dynamic_checkpoint_dir(params: Mapping, stats: Mapping,
                                  folder: str,
                                  extras: Mapping | None = None,
                                  num_layers: int = 18) -> list[str]:
    """`DynDepthModel` pytrees -> the same per-net reference layout.

    The dynamicdepth nets share the ManyDepth state-dict layouts
    (`dynamicdepth/trainer.py:127-167`, `:1380-1407` load/save);
    `DynDepthModel` hoists the matching encoder's trunk + reduce_conv to the
    top level (the inverse of `convert_dynamic_checkpoint_dir`), so re-nest
    them and reuse the ManyDepth exporter.
    """
    params = dict(params)
    stats = dict(stats)
    params["encoder"] = {"encoder": params.pop("encoder"),
                         "reduce_conv": params.pop("reduce_conv")}
    stats["encoder"] = {"encoder": stats["encoder"]}
    return export_mal_checkpoint_dir(params, stats, folder, extras,
                                     num_layers)


def export_mal_checkpoint_dir(params: Mapping, stats: Mapping,
                              folder: str,
                              extras: Mapping | None = None,
                              num_layers: int = 18) -> list[str]:
    """MALModel (params, batch_stats) -> per-net reference `.pth` files.

    Writes the upstream ManyDepth layout (`encoder.pth` with embedded depth
    bins, `depth.pth`, `mono_encoder.pth`, `mono_depth.pth`,
    `pose_encoder.pth`, `pose.pth`) that `load_manydepth`
    (`repdepth.py:76-99`) and the eval split-load path
    (`evaluate_depth.py:335-365`) consume. Returns the written paths.
    """
    import torch

    os.makedirs(folder, exist_ok=True)

    def _wrap(flat: dict) -> dict:
        # depth bins stay PYTHON floats: the DynamicDepth bin restore does
        # numpy arithmetic on them (`dynamicdepth/trainer.py:1410-1416` ->
        # `resnet_encoder.py compute_depth_bins`), which chokes on 0-dim
        # tensors; floats satisfy every consumer (incl. our converter)
        return {k: (float(np.asarray(v))
                    if k in ("min_depth_bin", "max_depth_bin")
                    else torch.from_numpy(np.ascontiguousarray(v)))
                for k, v in flat.items()}

    def _trunk_with_fc(net: str) -> dict:
        sd = export_resnet_trunk(params[net]["encoder"],
                                 stats[net]["encoder"], 18,
                                 prefix="encoder.")
        # torchvision's frozen classifier head: never executed by the
        # reference (`resnet_encoder.py:381-383` freezes it) but present in
        # its state dicts, and `load_manydepth` loads the pose encoder
        # STRICTLY (`repdepth.py:91`) — emit zero placeholders
        sd["encoder.fc.weight"] = np.zeros((1000, 512), np.float32)
        sd["encoder.fc.bias"] = np.zeros(1000, np.float32)
        return sd

    nets = {
        "encoder": export_matching_encoder(
            params["encoder"], stats["encoder"], extras, num_layers),
        "depth": export_depth_decoder(params["depth"]),
        "mono_encoder": _trunk_with_fc("mono_encoder"),
        "mono_depth": export_depth_decoder(params["mono_depth"]),
        "pose_encoder": _trunk_with_fc("pose_encoder"),
        "pose": export_pose_decoder(params["pose"]),
    }
    paths = []
    for name, flat in nets.items():
        path = os.path.join(folder, f"{name}.pth")
        torch.save(_wrap(flat), path)
        paths.append(path)
    if extras and "min_depth_bin" in extras:
        # track.pth mirrors the trainer's bin snapshot
        # (`manydepth/trainer.py:1620-1628`)
        torch.save({"min_depth_bin": torch.tensor(
                        float(np.asarray(extras["min_depth_bin"]))),
                    "max_depth_bin": torch.tensor(
                        float(np.asarray(extras["max_depth_bin"])))},
                   os.path.join(folder, "track.pth"))
        paths.append(os.path.join(folder, "track.pth"))
    return paths
