"""Mask2Former reverse converter: variables -> detectron2 .pkl.

Round-trip gate through `convert_mask2former_state` (itself torch-twin
forward-parity tested, tests/test_convert_mask2former.py): a segmenter
fine-tuned with `cli finetune-seg` exports back into the detectron2 key
layout bit-exactly, incl. the `relative_position_index` buffers detectron2
checkpoints carry.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.convert.mask2former import (convert_mask2former_pkl,
                                         convert_mask2former_state,
                                         export_mask2former_pkl,
                                         export_mask2former_state, load_pkl)
from mal_tpu.segment.mask2former import Mask2Former


def _tiny_variables():
    model = Mask2Former(num_classes=5, swin_size="tiny", num_queries=8)
    rng = jax.random.PRNGKey(2)
    return model.init(rng, jnp.zeros((1, 64, 96, 3)))


def test_export_mask2former_roundtrip(tmp_path):
    variables = jax.device_get(_tiny_variables())
    path = str(tmp_path / "seg.pkl")
    export_mask2former_pkl(variables, path, size="tiny")

    sd = load_pkl(path)
    # detectron2 layout spot checks
    assert "backbone.patch_embed.proj.weight" in sd
    assert sd["backbone.patch_embed.proj.weight"].shape[2:] == (4, 4)
    assert "backbone.layers.0.blocks.1.attn.relative_position_index" in sd
    assert sd["sem_seg_head.predictor.transformer_cross_attention_layers.0."
              "multihead_attn.in_proj_weight"].shape[0] % 3 == 0

    back = convert_mask2former_pkl(path, size="tiny")
    want = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    got = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_flatten_with_path(back["params"])[0]}
    assert set(want) == set(got)
    for k, v in want.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(got[k]),
                                      err_msg=k)
