"""Reverse converter: mal_tpu pytrees -> reference `.pth` layout.

Round-trip gate: export with `convert/export_pth.py`, re-ingest with
`convert_mal_checkpoint_dir` (which is itself oracle-tested against the
reference's own eval pipeline, tests/test_ref_oracle_manydepth.py), and
require bit-identical pytrees — proving the exported files carry the exact
reference key layout (`repdepth.py:76-99`, `evaluate_depth.py:335-365`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mal_tpu.config import Config
from mal_tpu.convert import convert_mal_checkpoint_dir
from mal_tpu.convert.export_pth import export_mal_checkpoint_dir
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import MALModel

D = 16
CFG = Config(height=64, width=96, num_depth_bins=D, batch_size=2)


def _init_variables():
    model = MALModel(CFG)
    rng = jax.random.PRNGKey(5)
    batch = synthetic_batch(CFG, rng, batch_size=1)
    return model.init({"params": rng}, batch, jnp.asarray(0.1),
                      jnp.asarray(10.0), rng, train=False)


def test_export_roundtrip_bit_exact(tmp_path):
    variables = _init_variables()
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    out = tmp_path / "exported"
    paths = export_mal_checkpoint_dir(
        params, stats, str(out),
        extras={"min_depth_bin": 0.37, "max_depth_bin": 9.25}, num_layers=18)
    names = {p.split("/")[-1] for p in paths}
    assert names == {"encoder.pth", "depth.pth", "mono_encoder.pth",
                     "mono_depth.pth", "pose_encoder.pth", "pose.pth",
                     "track.pth"}

    params2, stats2, extras2 = convert_mal_checkpoint_dir(str(out), 18)
    np.testing.assert_allclose(float(extras2["min_depth_bin"]), 0.37,
                               rtol=1e-6)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_flatten_with_path(params2)[0]}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        assert ks in flat2, ks
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[ks]),
                                      err_msg=ks)
    # batch_stats too (BN running statistics)
    s2 = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(stats2)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(stats)[0]:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(s2[jax.tree_util.keystr(k)]))


def test_exported_files_are_reference_layout(tmp_path):
    """The .pth files torch-load with the reference's exact key names and
    torch conv layout (O, I, kh, kw)."""
    variables = _init_variables()
    out = tmp_path / "exported"
    export_mal_checkpoint_dir(jax.device_get(variables["params"]),
                              jax.device_get(variables["batch_stats"]),
                              str(out), num_layers=18)

    enc = torch.load(out / "encoder.pth", weights_only=False)
    # Sequential wrapping of the matching encoder (resnet_encoder.py:106-110)
    assert enc["layer0.0.weight"].shape == (64, 3, 7, 7)
    assert "layer0.1.running_mean" in enc
    assert "layer1.1.0.conv1.weight" in enc
    assert enc["reduce_conv.0.weight"].shape[1] == 64 + D

    pose_enc = torch.load(out / "pose_encoder.pth", weights_only=False)
    assert pose_enc["encoder.conv1.weight"].shape == (64, 6, 7, 7)
    assert pose_enc["encoder.layer4.1.bn2.num_batches_tracked"].dtype == \
        torch.int64

    depth = torch.load(out / "depth.pth", weights_only=False)
    assert "decoder.0.conv.conv.weight" in depth
    assert depth["decoder.10.conv.weight"].shape[0] == 1  # disp head

    pose = torch.load(out / "pose.pth", weights_only=False)
    assert pose["net.3.weight"].shape[0] == 6 * 2  # 2 frames x (aa, t)


@pytest.mark.slow
def test_cli_export_pth_from_orbax(tmp_path):
    """End-to-end: orbax TrainState checkpoint -> `cli export-pth` ->
    reference-layout dir that converts back to the same weights."""
    from mal_tpu.cli import main
    from mal_tpu.train.state import create_train_state
    from mal_tpu.utils.checkpoint import save_checkpoint

    model = MALModel(CFG)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(CFG, rng, batch_size=2)
    state = create_train_state(CFG, model, rng, jax.device_get(batch))
    state = state.replace(bins=state.bins.load(0.5, 7.0))
    ckdir = tmp_path / "orbax"
    save_checkpoint(str(ckdir), jax.device_get(state), CFG)

    out = tmp_path / "pth"
    main(["export-pth", "--ckpt", str(ckdir), "--out", str(out)])

    params2, _, extras2 = convert_mal_checkpoint_dir(str(out), 18)
    np.testing.assert_allclose(float(extras2["min_depth_bin"]), 0.5,
                               rtol=1e-6)
    want = jax.device_get(state).params
    got = {jax.tree_util.keystr(k): v
           for k, v in jax.tree_util.tree_flatten_with_path(params2)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(want)[0]:
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(got[jax.tree_util.keystr(k)]))


def test_export_dynamic_roundtrip(tmp_path):
    """DynamicDepth: same per-net layout with the trunk/reduce_conv
    re-nesting undone (`dynamicdepth/trainer.py:127-167`) — bit-exact
    round-trip through `convert_dynamic_checkpoint_dir`."""
    from mal_tpu.convert.export_pth import export_dynamic_checkpoint_dir
    from mal_tpu.dynamic.evaluate import convert_dynamic_checkpoint_dir
    from mal_tpu.dynamic.model import DynDepthModel

    cfg = CFG.replace(method="dynamicdepth")
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(6)
    batch = dict(synthetic_batch(cfg, rng, batch_size=1))
    H, W = cfg.height, cfg.width
    doj = np.zeros((1, H, W), np.float32)
    doj[:, 20:40, 30:60] = 1.0
    batch["doj_mask"] = jnp.asarray(doj)
    batch["doj_mask-1"] = jnp.asarray(doj)
    batch["doj_mask+1"] = jnp.asarray(doj)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.1),
                           jnp.asarray(10.0), rng, train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    out = tmp_path / "dyn"
    export_dynamic_checkpoint_dir(
        params, stats, str(out),
        extras={"min_depth_bin": 0.2, "max_depth_bin": 11.0})
    params2, stats2, extras2 = convert_dynamic_checkpoint_dir(str(out))
    np.testing.assert_allclose(float(extras2["min_depth_bin"]), 0.2,
                               rtol=1e-6)

    got = {jax.tree_util.keystr(k): v
           for k, v in jax.tree_util.tree_flatten_with_path(params2)[0]}
    for k, v in jax.tree_util.tree_flatten_with_path(params)[0]:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(got[ks]),
                                      err_msg=ks)
