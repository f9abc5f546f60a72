"""Mask2Former checkpoint conversion: detectron2 `.pkl` -> flax variables.

The reference builds its frozen instance segmenter from
`maskformer2_swin_large_IN21k_384_bs16_90k.yaml` + COCO-instance weights
(`manydepth/options.py:288-295`, `manydepth/trainer.py:350-357`). detectron2
checkpoints are pickled dicts `{"model": {key: np.ndarray}, ...}` with keys:

  backbone.patch_embed.* / backbone.layers.{s}.blocks.{b}.* /
  backbone.layers.{s}.downsample.* / backbone.norm{0..3}.*
      (D2SwinTransformer, `mask2former/modeling/backbone/swin.py`)
  sem_seg_head.pixel_decoder.input_proj.{i}.{0,1}.* /
  .transformer.level_embed / .transformer.encoder.layers.{l}.* /
  .adapter_1.* / .layer_1.* / .mask_features.*
      (`modeling/pixel_decoder/msdeformattn.py:200-358`)
  sem_seg_head.predictor.*   (`modeling/transformer_decoder/
      mask2former_transformer_decoder.py:280-330`)

Target: `mal_tpu.segment.mask2former.Mask2Former` variables
({"params": ...}; every norm is LayerNorm/GroupNorm — no batch stats).
"""

from __future__ import annotations

import pickle
from typing import Any, Mapping

import numpy as np

from mal_tpu.convert.torch_weights import _conv, _take


def load_pkl(path: str) -> dict[str, np.ndarray]:
    """detectron2 .pkl checkpoint -> flat {key: np.ndarray}."""
    with open(path, "rb") as f:
        obj = pickle.load(f, encoding="latin1")
    model = obj.get("model", obj)
    out = {}
    for k, v in model.items():
        if hasattr(v, "numpy"):
            v = v.numpy()
        out[k] = np.asarray(v)
    return out


def _dense(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": np.transpose(_take(sd, prefix + ".weight"), (1, 0))}
    if bias:
        out["bias"] = _take(sd, prefix + ".bias")
    return out


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": _take(sd, prefix + ".weight"),
            "bias": _take(sd, prefix + ".bias")}


def _conv2d(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _conv(_take(sd, prefix + ".weight"))}
    if bias:
        out["bias"] = _take(sd, prefix + ".bias")
    return out


_DEPTHS = {"tiny": (2, 2, 6, 2), "small": (2, 2, 18, 2),
           "base": (2, 2, 18, 2), "large": (2, 2, 18, 2)}


def convert_swin(sd: Mapping[str, np.ndarray], size: str = "large",
                 prefix: str = "backbone.") -> dict:
    """D2SwinTransformer state dict -> our `SwinTransformer` params.

    The `attn.relative_position_index` buffers are recomputed constants and
    skipped; drop-path has no parameters; APE is off in every shipped config.
    """
    p: dict[str, Any] = {
        "patch_embed": _conv2d(sd, prefix + "patch_embed.proj"),
        "patch_norm": _ln(sd, prefix + "patch_embed.norm"),
    }
    for s, depth in enumerate(_DEPTHS[size]):
        blocks = []
        for b in range(depth):
            bp = f"{prefix}layers.{s}.blocks.{b}."
            blocks.append({
                "norm1": _ln(sd, bp + "norm1"),
                "attn": {
                    "relative_position_bias_table":
                        _take(sd, bp + "attn.relative_position_bias_table"),
                    "qkv": _dense(sd, bp + "attn.qkv"),
                    "proj": _dense(sd, bp + "attn.proj"),
                },
                "norm2": _ln(sd, bp + "norm2"),
                "mlp_fc1": _dense(sd, bp + "mlp.fc1"),
                "mlp_fc2": _dense(sd, bp + "mlp.fc2"),
            })
        # the stage runs as ONE nn.scan'd block: stack per-block leaves on a
        # new leading axis (`mal_tpu.segment.swin.SwinStage`)
        import jax

        p[f"stage{s}"] = {"blocks": jax.tree.map(
            lambda *xs: np.stack(xs, axis=0), *blocks)}
        if s < 3:
            p[f"merge{s}"] = {
                "norm": _ln(sd, f"{prefix}layers.{s}.downsample.norm"),
                "reduction": _dense(sd, f"{prefix}layers.{s}.downsample.reduction",
                                    bias=False),
            }
        p[f"out_norm{s}"] = _ln(sd, f"{prefix}norm{s}")
    return p


def _gn(sd: Mapping, prefix: str) -> dict:
    return {"scale": _take(sd, prefix + ".weight"),
            "bias": _take(sd, prefix + ".bias")}


def convert_pixel_decoder(sd: Mapping[str, np.ndarray],
                          prefix: str = "sem_seg_head.pixel_decoder.",
                          num_layers: int = 6) -> dict:
    """MSDeformAttnPixelDecoder -> our params (input_proj index 0 = res5,
    `msdeformattn.py:213-220` builds from low to high resolution)."""
    p: dict[str, Any] = {}
    for i in range(3):
        p[f"input_proj_{i}"] = _conv2d(sd, f"{prefix}input_proj.{i}.0")
        p[f"input_proj_gn_{i}"] = _gn(sd, f"{prefix}input_proj.{i}.1")
    p["level_embed"] = _take(sd, prefix + "transformer.level_embed")
    for l in range(num_layers):
        lp = f"{prefix}transformer.encoder.layers.{l}."
        p[f"layer_{l}"] = {
            "self_attn": {
                "sampling_offsets": _dense(sd, lp + "self_attn.sampling_offsets"),
                "attention_weights": _dense(sd, lp + "self_attn.attention_weights"),
                "value_proj": _dense(sd, lp + "self_attn.value_proj"),
                "output_proj": _dense(sd, lp + "self_attn.output_proj"),
            },
            "norm1": _ln(sd, lp + "norm1"),
            "linear1": _dense(sd, lp + "linear1"),
            "linear2": _dense(sd, lp + "linear2"),
            "norm2": _ln(sd, lp + "norm2"),
        }
    p["fpn_adapter"] = _conv2d(sd, prefix + "adapter_1", bias=False)
    p["adapter_gn"] = _gn(sd, prefix + "adapter_1.norm")
    p["fpn_conv"] = _conv2d(sd, prefix + "layer_1", bias=False)
    p["layer_gn"] = _gn(sd, prefix + "layer_1.norm")
    p["mask_features"] = _conv2d(sd, prefix + "mask_features")
    return p


def _mha(sd: Mapping, prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) -> our q/k/v/out Denses."""
    w = _take(sd, prefix + ".in_proj_weight")   # (3C, C)
    b = _take(sd, prefix + ".in_proj_bias")     # (3C,)
    C = w.shape[1]
    qw, kw, vw = w[:C], w[C:2 * C], w[2 * C:]
    qb, kb, vb = b[:C], b[C:2 * C], b[2 * C:]
    return {
        "q": {"kernel": qw.T, "bias": qb},
        "k": {"kernel": kw.T, "bias": kb},
        "v": {"kernel": vw.T, "bias": vb},
        "out": _dense(sd, prefix + ".out_proj"),
    }


def convert_predictor(sd: Mapping[str, np.ndarray],
                      prefix: str = "sem_seg_head.predictor.",
                      num_layers: int = 9) -> dict:
    """MultiScaleMaskedTransformerDecoder -> our `MaskedTransformerDecoder`."""
    p: dict[str, Any] = {
        "query_feat": _take(sd, prefix + "query_feat.weight"),
        "query_embed": _take(sd, prefix + "query_embed.weight"),
        "level_embed": _take(sd, prefix + "level_embed.weight"),
        "decoder_norm": _ln(sd, prefix + "decoder_norm"),
        "class_embed": _dense(sd, prefix + "class_embed"),
        "mask_embed": {f"fc{i}": _dense(sd, f"{prefix}mask_embed.layers.{i}")
                       for i in range(3)},
    }
    for l in range(num_layers):
        p[f"xattn_{l}"] = _mha(
            sd, f"{prefix}transformer_cross_attention_layers.{l}.multihead_attn")
        p[f"xnorm_{l}"] = _ln(
            sd, f"{prefix}transformer_cross_attention_layers.{l}.norm")
        p[f"sattn_{l}"] = _mha(
            sd, f"{prefix}transformer_self_attention_layers.{l}.self_attn")
        p[f"snorm_{l}"] = _ln(
            sd, f"{prefix}transformer_self_attention_layers.{l}.norm")
        p[f"ffn1_{l}"] = _dense(
            sd, f"{prefix}transformer_ffn_layers.{l}.linear1")
        p[f"ffn2_{l}"] = _dense(
            sd, f"{prefix}transformer_ffn_layers.{l}.linear2")
        p[f"fnorm_{l}"] = _ln(
            sd, f"{prefix}transformer_ffn_layers.{l}.norm")
    return p


def convert_mask2former_state(sd: Mapping[str, np.ndarray],
                              size: str = "large") -> dict:
    """Full detectron2 state -> `Mask2Former` variables ({"params": ...})."""
    params = {
        "backbone": convert_swin(sd, size),
        "pixel_decoder": convert_pixel_decoder(sd),
        "predictor": convert_predictor(sd),
    }
    return {"params": params}


def convert_mask2former_pkl(path: str, size: str = "large") -> dict:
    """`maskformer2_swin_large_*.pkl` -> `Mask2Former` variables, ready to
    pass to `Trainer(..., seg_variables=...)`."""
    return convert_mask2former_state(load_pkl(path), size)


# ---------------------------------------------------------------------------
# Reverse conversion: Mask2Former variables -> detectron2 .pkl
# ---------------------------------------------------------------------------

def _dense_inv(sd: dict, prefix: str, p: Mapping, bias: bool = True):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]), (1, 0))
    if bias:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def _ln_inv(sd: dict, prefix: str, p: Mapping):
    sd[prefix + ".weight"] = np.asarray(p["scale"])
    sd[prefix + ".bias"] = np.asarray(p["bias"])


def _conv2d_inv(sd: dict, prefix: str, p: Mapping, bias: bool = True):
    sd[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]),
                                          (3, 2, 0, 1))
    if bias:
        sd[prefix + ".bias"] = np.asarray(p["bias"])


def export_swin(p: Mapping, size: str = "large",
                prefix: str = "backbone.") -> dict:
    """Inverse of `convert_swin`, incl. the `relative_position_index`
    buffers detectron2 checkpoints carry (recomputed constants here)."""
    import jax

    from mal_tpu.segment.swin import CONFIGS, relative_position_index

    _, depths, _, ws = CONFIGS[size]
    rpi = relative_position_index(ws).astype(np.int64)
    sd: dict[str, np.ndarray] = {}
    _conv2d_inv(sd, prefix + "patch_embed.proj", p["patch_embed"])
    _ln_inv(sd, prefix + "patch_embed.norm", p["patch_norm"])
    for s, depth in enumerate(depths):
        stacked = p[f"stage{s}"]["blocks"]
        for b in range(depth):
            blk = jax.tree.map(lambda x: np.asarray(x)[b], stacked)
            bp = f"{prefix}layers.{s}.blocks.{b}."
            _ln_inv(sd, bp + "norm1", blk["norm1"])
            sd[bp + "attn.relative_position_bias_table"] = \
                blk["attn"]["relative_position_bias_table"]
            sd[bp + "attn.relative_position_index"] = rpi
            _dense_inv(sd, bp + "attn.qkv", blk["attn"]["qkv"])
            _dense_inv(sd, bp + "attn.proj", blk["attn"]["proj"])
            _ln_inv(sd, bp + "norm2", blk["norm2"])
            _dense_inv(sd, bp + "mlp.fc1", blk["mlp_fc1"])
            _dense_inv(sd, bp + "mlp.fc2", blk["mlp_fc2"])
        if s < 3:
            _ln_inv(sd, f"{prefix}layers.{s}.downsample.norm",
                    p[f"merge{s}"]["norm"])
            _dense_inv(sd, f"{prefix}layers.{s}.downsample.reduction",
                       p[f"merge{s}"]["reduction"], bias=False)
        _ln_inv(sd, f"{prefix}norm{s}", p[f"out_norm{s}"])
    return sd


def export_pixel_decoder(p: Mapping,
                         prefix: str = "sem_seg_head.pixel_decoder.",
                         num_layers: int = 6) -> dict:
    sd: dict[str, np.ndarray] = {}
    for i in range(3):
        _conv2d_inv(sd, f"{prefix}input_proj.{i}.0", p[f"input_proj_{i}"])
        _ln_inv(sd, f"{prefix}input_proj.{i}.1", p[f"input_proj_gn_{i}"])
    sd[prefix + "transformer.level_embed"] = np.asarray(p["level_embed"])
    for l in range(num_layers):
        lp = f"{prefix}transformer.encoder.layers.{l}."
        lay = p[f"layer_{l}"]
        for name in ("sampling_offsets", "attention_weights",
                     "value_proj", "output_proj"):
            _dense_inv(sd, lp + "self_attn." + name, lay["self_attn"][name])
        _ln_inv(sd, lp + "norm1", lay["norm1"])
        _dense_inv(sd, lp + "linear1", lay["linear1"])
        _dense_inv(sd, lp + "linear2", lay["linear2"])
        _ln_inv(sd, lp + "norm2", lay["norm2"])
    _conv2d_inv(sd, prefix + "adapter_1", p["fpn_adapter"], bias=False)
    _ln_inv(sd, prefix + "adapter_1.norm", p["adapter_gn"])
    _conv2d_inv(sd, prefix + "layer_1", p["fpn_conv"], bias=False)
    _ln_inv(sd, prefix + "layer_1.norm", p["layer_gn"])
    _conv2d_inv(sd, prefix + "mask_features", p["mask_features"])
    return sd


def _mha_inv(sd: dict, prefix: str, p: Mapping):
    """Repack our q/k/v/out Denses into torch nn.MultiheadAttention keys."""
    qw = np.transpose(np.asarray(p["q"]["kernel"]), (1, 0))
    kw = np.transpose(np.asarray(p["k"]["kernel"]), (1, 0))
    vw = np.transpose(np.asarray(p["v"]["kernel"]), (1, 0))
    sd[prefix + ".in_proj_weight"] = np.concatenate([qw, kw, vw], axis=0)
    sd[prefix + ".in_proj_bias"] = np.concatenate(
        [np.asarray(p[n]["bias"]) for n in ("q", "k", "v")], axis=0)
    _dense_inv(sd, prefix + ".out_proj", p["out"])


def export_predictor(p: Mapping,
                     prefix: str = "sem_seg_head.predictor.",
                     num_layers: int = 9) -> dict:
    sd: dict[str, np.ndarray] = {}
    sd[prefix + "query_feat.weight"] = np.asarray(p["query_feat"])
    sd[prefix + "query_embed.weight"] = np.asarray(p["query_embed"])
    sd[prefix + "level_embed.weight"] = np.asarray(p["level_embed"])
    _ln_inv(sd, prefix + "decoder_norm", p["decoder_norm"])
    _dense_inv(sd, prefix + "class_embed", p["class_embed"])
    for i in range(3):
        _dense_inv(sd, f"{prefix}mask_embed.layers.{i}",
                   p["mask_embed"][f"fc{i}"])
    for l in range(num_layers):
        _mha_inv(sd, f"{prefix}transformer_cross_attention_layers.{l}"
                 ".multihead_attn", p[f"xattn_{l}"])
        _ln_inv(sd, f"{prefix}transformer_cross_attention_layers.{l}.norm",
                p[f"xnorm_{l}"])
        _mha_inv(sd, f"{prefix}transformer_self_attention_layers.{l}"
                 ".self_attn", p[f"sattn_{l}"])
        _ln_inv(sd, f"{prefix}transformer_self_attention_layers.{l}.norm",
                p[f"snorm_{l}"])
        _dense_inv(sd, f"{prefix}transformer_ffn_layers.{l}.linear1",
                   p[f"ffn1_{l}"])
        _dense_inv(sd, f"{prefix}transformer_ffn_layers.{l}.linear2",
                   p[f"ffn2_{l}"])
        _ln_inv(sd, f"{prefix}transformer_ffn_layers.{l}.norm",
                p[f"fnorm_{l}"])
    return sd


def export_mask2former_state(variables: Mapping,
                             size: str = "large") -> dict:
    """`Mask2Former` variables -> flat detectron2-key state dict, so a
    segmenter fine-tuned in mal_tpu (`cli finetune-seg`) round-trips into
    the detectron2/Mask2Former ecosystem. Inverse of
    `convert_mask2former_state`; round-trip tested bit-exactly."""
    params = variables["params"]
    sd: dict[str, np.ndarray] = {}
    sd.update(export_swin(params["backbone"], size))
    sd.update(export_pixel_decoder(params["pixel_decoder"]))
    sd.update(export_predictor(params["predictor"]))
    return sd


def export_mask2former_pkl(variables: Mapping, path: str,
                           size: str = "large") -> str:
    """Write a detectron2-format `.pkl` ({"model": {...}, "__author__"})."""
    sd = export_mask2former_state(variables, size)
    with open(path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "mal_tpu"}, f)
    return path
