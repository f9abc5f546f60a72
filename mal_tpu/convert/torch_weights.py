"""Reference-checkpoint conversion: torch `.pth` state dicts -> flax pytrees.

Supports the reference's checkpoint layouts (SURVEY.md §5 checkpoint/resume):
- per-net files `encoder.pth`, `mono_encoder.pth`, `depth.pth`,
  `mono_depth.pth`, `pose_encoder.pth`, `pose.pth` with depth bins embedded in
  `encoder.pth` (`manydepth/networks/repdepth.py:76-99`)
- whole-model `model.pth` state dicts with `encoder.` / `mono_encoder.` / ...
  prefixes (`manydepth/trainer.py:1605-1636`)

Layout conventions translated:
- torch conv (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
- torchvision ResNet naming (`conv1`, `bn1`, `layerN.M.*`) -> our
  `ResNetFeatures` naming (`conv1`, `bn1`, `layerN_M/*`)
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np


def load_pth(path: str) -> dict[str, np.ndarray]:
    """torch.load a state dict to numpy (host-side only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _take(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"missing key {key}; have e.g. {list(sd)[:8]}")
    return np.asarray(sd[key])


def _bn(sd, prefix):
    params = {"scale": _take(sd, prefix + ".weight"),
              "bias": _take(sd, prefix + ".bias")}
    stats = {"mean": _take(sd, prefix + ".running_mean"),
             "var": _take(sd, prefix + ".running_var")}
    return params, stats


_LAYER_BLOCKS = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3)}


def convert_resnet_trunk(sd: Mapping[str, np.ndarray], num_layers: int = 18,
                         prefix: str = "") -> tuple[dict, dict]:
    """torchvision-style resnet state dict -> (params, batch_stats) for
    `ResNetFeatures`. `prefix` e.g. 'encoder.' for `ResnetEncoder` wrappers."""
    p: dict[str, Any] = {}
    s: dict[str, Any] = {}

    p["conv1"] = {"kernel": _conv(_take(sd, prefix + "conv1.weight"))}
    p["bn1"], s["bn1"] = _bn(sd, prefix + "bn1")

    bottleneck = num_layers >= 50
    n_convs = 3 if bottleneck else 2
    for layer in range(1, 5):
        for block in range(_LAYER_BLOCKS[num_layers][layer - 1]):
            tpre = f"{prefix}layer{layer}.{block}."
            name = f"layer{layer}_{block}"
            bp: dict[str, Any] = {}
            bs: dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"kernel": _conv(_take(sd, tpre + f"conv{ci}.weight"))}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = _bn(sd, tpre + f"bn{ci}")
            if tpre + "downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(_take(sd, tpre + "downsample.0.weight"))}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, tpre + "downsample.1")
            p[name] = bp
            s[name] = bs
    return p, s


def convert_matching_encoder(sd: Mapping[str, np.ndarray],
                             num_layers: int = 18) -> tuple[dict, dict, dict]:
    """`ResnetEncoderMatching` state dict -> (params, batch_stats, extras).

    The reference wraps the trunk in Sequentials: layer0=(conv1,bn1,relu),
    layer1=(maxpool, resnet.layer1) (`resnet_encoder.py:106-110`), so keys
    arrive as `layer0.0.*`, `layer1.1.N.*`, `layerK.N.*` for K>=2.
    Returns depth bins in `extras` when present.
    """
    remapped: dict[str, np.ndarray] = {}
    extras: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k in ("min_depth_bin", "max_depth_bin"):
            extras[k] = np.asarray(v)
            continue
        nk = k
        if k.startswith("layer0.0."):
            nk = "conv1." + k[len("layer0.0."):]
        elif k.startswith("layer0.1."):
            nk = "bn1." + k[len("layer0.1."):]
        elif k.startswith("layer1.1."):
            nk = "layer1." + k[len("layer1.1."):]
        remapped[nk] = v

    trunk_p, trunk_s = convert_resnet_trunk(remapped, num_layers)
    params = {"encoder": trunk_p,
              "reduce_conv": {"kernel": _conv(_take(sd, "reduce_conv.0.weight")),
                              "bias": _take(sd, "reduce_conv.0.bias")}}
    stats = {"encoder": trunk_s}
    return params, stats, extras


def convert_depth_decoder(sd: Mapping[str, np.ndarray]) -> dict:
    """`DepthDecoder` ModuleList state dict -> params.

    List order (`depth_decoder.py:29-50`): index 2*(4-i) is ("upconv", i, 0),
    2*(4-i)+1 is ("upconv", i, 1) for i=4..0, index 10 is ("dispconv", 0).
    """
    params: dict[str, Any] = {}
    for idx, i in enumerate(range(4, -1, -1)):
        for j in (0, 1):
            li = 2 * idx + j
            params[f"upconv_{i}_{j}"] = {"conv": {
                "kernel": _conv(_take(sd, f"decoder.{li}.conv.conv.weight")),
                "bias": _take(sd, f"decoder.{li}.conv.conv.bias")}}
    params["dispconv_0"] = {"conv": {
        "kernel": _conv(_take(sd, "decoder.10.conv.weight")),
        "bias": _take(sd, "decoder.10.conv.bias")}}
    return params


def convert_pose_decoder(sd: Mapping[str, np.ndarray]) -> dict:
    """`PoseDecoder` net=[squeeze, pose0, pose1, pose2] (`pose_decoder.py:23-31`)."""
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    return {name: {"kernel": _conv(_take(sd, f"net.{i}.weight")),
                   "bias": _take(sd, f"net.{i}.bias")}
            for i, name in enumerate(names)}


def convert_pose_dyj(sd: Mapping[str, np.ndarray],
                     num_layers: int = 18) -> tuple[dict, dict]:
    """`ResnetEncoderDYJ` (`resnet_encoder.py:400-476`): multi-image resnet
    trunk + net=[squeeze, pose0, pose1, pose2] conv head."""
    tp, ts = convert_resnet_trunk(sd, num_layers, prefix="encoder.")
    params: dict[str, Any] = {"encoder": tp}
    for i, name in enumerate(["squeeze", "pose_0", "pose_1", "pose_2"]):
        params[name] = {"kernel": _conv(_take(sd, f"net.{i}.weight")),
                        "bias": _take(sd, f"net.{i}.bias")}
    return params, {"encoder": ts}


def convert_imagenet_trunk(sd: Mapping[str, np.ndarray],
                           num_layers: int = 18,
                           num_input_images: int = 1) -> tuple[dict, dict]:
    """torchvision ImageNet resnet state dict -> (params, batch_stats).

    The `--weights_init pretrained` path: the reference initializes every
    ResNet encoder from torchvision ImageNet weights
    (`manydepth/networks/resnet_encoder.py:377,356-398`); multi-image pose
    encoders tile conv1 across the stacked-image axis and divide by the image
    count (`resnet_multiimage_input`, `resnet_encoder.py:63-67`). The `fc.*`
    head keys are ignored (the reference freezes them and never runs them).
    """
    sd = dict(sd)
    if num_input_images > 1:
        w = np.asarray(sd["conv1.weight"])
        sd["conv1.weight"] = (np.concatenate([w] * num_input_images, axis=1)
                              / float(num_input_images))
    return convert_resnet_trunk(sd, num_layers)


def convert_pose_cnn(sd: Mapping[str, np.ndarray]) -> dict:
    params = {f"conv_{i}": {"kernel": _conv(_take(sd, f"net.{i}.weight")),
                            "bias": _take(sd, f"net.{i}.bias")}
              for i in range(7)}
    params["pose_conv"] = {"kernel": _conv(_take(sd, "pose_conv.weight")),
                           "bias": _take(sd, "pose_conv.bias")}
    return params


def _split_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    pl = prefix + "."
    return {k[len(pl):]: v for k, v in sd.items() if k.startswith(pl)}


_MAL_NETS = ("encoder", "depth", "mono_encoder", "mono_depth",
             "pose_encoder", "pose")


def convert_mal_checkpoint_dir(folder: str, num_layers: int = 18,
                               pose_cnn: bool = False,
                               only: tuple[str, ...] | None = None):
    """Reference checkpoint dir -> (params, batch_stats, extras) for MALModel.

    Accepts either per-net files or a whole `model.pth`. `only` restricts
    conversion to a subset of nets — partial checkpoint dirs are real in the
    reference (`--mono_weights_folder` folders hold just the four teacher/
    pose nets, `manydepth/trainer.py:1638-1655`), so files outside the
    subset are never opened.
    """
    wanted = _MAL_NETS if only is None else tuple(
        n for n in _MAL_NETS if n in only)
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    extras: dict[str, Any] = {}

    model_pth = os.path.join(folder, "model.pth")
    if os.path.exists(model_pth):
        sd = load_pth(model_pth)
        nets = {name: _split_prefix(sd, name) for name in wanted}
    else:
        nets = {name: load_pth(os.path.join(folder, f"{name}.pth"))
                for name in wanted}

    if "encoder" in nets:
        params["encoder"], stats["encoder"], extras = \
            convert_matching_encoder(nets["encoder"], num_layers)
    if "depth" in nets:
        params["depth"] = convert_depth_decoder(nets["depth"])

    if "mono_encoder" in nets:
        mp, ms = convert_resnet_trunk(nets["mono_encoder"], 18,
                                      prefix="encoder.")
        params["mono_encoder"] = {"encoder": mp}
        stats["mono_encoder"] = {"encoder": ms}
    if "mono_depth" in nets:
        params["mono_depth"] = convert_depth_decoder(nets["mono_depth"])

    if "pose_encoder" in nets:
        if pose_cnn:
            params["pose_encoder"] = convert_pose_cnn(nets["pose_encoder"])
        else:
            pp, ps = convert_resnet_trunk(nets["pose_encoder"], 18,
                                          prefix="encoder.")
            params["pose_encoder"] = {"encoder": pp}
            stats["pose_encoder"] = {"encoder": ps}
    if "pose" in nets and not pose_cnn:
        params["pose"] = convert_pose_decoder(nets["pose"])

    track = os.path.join(folder, "track.pth")
    if os.path.exists(track):
        extras.update(load_pth(track))
    return params, stats, extras
