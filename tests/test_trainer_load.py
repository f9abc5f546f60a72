"""Trainer pretrained initialization + cadence flags.

Covers the reference's checkpoint-bootstrap family — `--load_pretrained`
(`repdepth.py:76-99` load_manydepth), `--mono_weights_folder`
(`manydepth/trainer.py:1638-1655` load_mono_model), `--models_to_load`
(`dynamicdepth/trainer.py:1403`) — and the trainer cadence flags
`--validate_from` (`manydepth/trainer.py:514`) and `--save_until`
(`manydepth/trainer.py:536`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.train.trainer import MetricLogger, Trainer

from test_convert import (TorchDepthDecoder, TorchMatchingEncoderLayout,
                          TorchPoseDecoder, TorchResNet18)
from torch import nn

D = 16
CFG = Config(height=64, width=96, num_depth_bins=D, batch_size=2,
             log_every=10**9, validate_every=10**9, ckpt_dir="")


def _make_ref_ckpt_dir(tmp_path):
    """Reference-layout per-net .pth dir with depth bins in encoder.pth."""
    torch.manual_seed(3)

    class Wrap(nn.Module):  # ResnetEncoder stores the trunk under .encoder
        def __init__(self, num_input_images=1):
            super().__init__()
            self.encoder = TorchResNet18()
            if num_input_images > 1:
                self.encoder.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2,
                                               3, bias=False)

    ck = tmp_path / "KITTI_MR"
    ck.mkdir()
    enc_sd = TorchMatchingEncoderLayout(D).state_dict()
    enc_sd["min_depth_bin"] = torch.tensor(0.42)
    enc_sd["max_depth_bin"] = torch.tensor(8.5)
    torch.save(enc_sd, ck / "encoder.pth")
    torch.save(TorchDepthDecoder().state_dict(), ck / "depth.pth")
    torch.save(Wrap().state_dict(), ck / "mono_encoder.pth")
    torch.save(TorchDepthDecoder().state_dict(), ck / "mono_depth.pth")
    torch.save(Wrap(2).state_dict(), ck / "pose_encoder.pth")
    torch.save(TorchPoseDecoder(nf=2).state_dict(), ck / "pose.pth")
    return str(ck)


class Loader:
    def __init__(self, cfg, n=2):
        self.batches = [
            jax.device_get(synthetic_batch(cfg, jax.random.PRNGKey(i), 2))
            for i in range(n)]

    def __iter__(self):
        return iter(self.batches)

    def epoch(self, e):
        return iter(self.batches)


def _leaf_norm(tree):
    return sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(tree))


@pytest.mark.slow
def test_load_pretrained_full(tmp_path):
    ck = _make_ref_ckpt_dir(tmp_path)
    t = Trainer(CFG, Loader(CFG), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: None))
    before = {k: _leaf_norm(v)
              for k, v in jax.device_get(t.state).params.items()}
    loaded = t.load_pretrained(ck)
    state = jax.device_get(t.state)
    # every sub-net replaced, depth bins restored from encoder.pth
    assert set(loaded) == {"encoder", "depth", "mono_encoder", "mono_depth",
                           "pose_encoder", "pose"}
    for k, b in before.items():
        assert _leaf_norm(state.params[k]) != b, k
    np.testing.assert_allclose(float(state.bins.min_depth), 0.42, rtol=1e-6)
    np.testing.assert_allclose(float(state.bins.max_depth), 8.5, rtol=1e-6)

    # the loaded state still trains
    t.run_epoch(0)
    assert t.step == 2


@pytest.mark.slow
def test_load_pretrained_mono_subset(tmp_path):
    """--mono_weights_folder: only teacher + pose nets change."""
    ck = _make_ref_ckpt_dir(tmp_path)
    t = Trainer(CFG, Loader(CFG), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: None))
    before = {k: _leaf_norm(v)
              for k, v in jax.device_get(t.state).params.items()}
    bins_before = float(jax.device_get(t.state).bins.min_depth)
    loaded = t.load_pretrained(
        ck, bins=False,
        models_to_load=("mono_encoder", "mono_depth", "pose_encoder", "pose"))
    state = jax.device_get(t.state)
    assert set(loaded) == {"mono_encoder", "mono_depth",
                           "pose_encoder", "pose"}
    for k in ("encoder", "depth"):
        assert _leaf_norm(state.params[k]) == before[k], k
    for k in loaded:
        assert _leaf_norm(state.params[k]) != before[k], k
    assert float(state.bins.min_depth) == bins_before  # bins untouched


@pytest.mark.slow
def test_load_pretrained_partial_dir(tmp_path):
    """A real --mono_weights_folder holds ONLY the four teacher/pose files
    (`manydepth/trainer.py:1638-1655`); loading the subset must never open
    the absent encoder/depth files."""
    ck = _make_ref_ckpt_dir(tmp_path)
    os.remove(os.path.join(ck, "encoder.pth"))
    os.remove(os.path.join(ck, "depth.pth"))
    t = Trainer(CFG, Loader(CFG), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: None))
    before = {k: _leaf_norm(v)
              for k, v in jax.device_get(t.state).params.items()}
    loaded = t.load_pretrained(
        ck, bins=False,
        models_to_load=("mono_encoder", "mono_depth", "pose_encoder", "pose"))
    state = jax.device_get(t.state)
    assert set(loaded) == {"mono_encoder", "mono_depth",
                           "pose_encoder", "pose"}
    for k in ("encoder", "depth"):
        assert _leaf_norm(state.params[k]) == before[k], k


def test_train_start_epoch():
    """train(start_epoch=k) resumes the epoch loop at k so epoch-keyed
    schedules (freeze epochs, loss_blc annealing, save cadence) see true
    epoch indices instead of replaying from 0."""
    cfg = CFG.replace(num_epochs=4)
    t = Trainer(cfg, Loader(cfg), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: None))
    seen = []
    t.run_epoch = lambda e: seen.append(e)
    t.train(start_epoch=2)
    assert seen == [2, 3]


@pytest.mark.slow
def test_validate_from_and_save_until(tmp_path):
    """--validate_from delays periodic validation; --save_until gates
    checkpoint writes (`manydepth/trainer.py:514,536`)."""
    gt = [np.full((CFG.height, CFG.width), 5.0) for _ in range(2)]
    cfg = CFG.replace(validate_every=2, validate_from=2,
                      save_until=10**9, ckpt_dir=str(tmp_path / "out"))
    logs = []
    t = Trainer(cfg, Loader(cfg, n=6), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: logs.append((s, m))))
    t.val_batches = Loader(cfg, n=1).batches
    t.gt_depths = gt
    t.run_epoch(0)
    val_steps = sorted({s for s, m in logs
                        if any(k.startswith("val/") for k in m)})
    # step 2 is suppressed by validate_from=2 (gate is strict >), step 4 runs
    assert 2 not in val_steps
    assert 4 in val_steps
    # save_until past the horizon: validation ran but nothing was saved
    assert not os.path.exists(cfg.ckpt_dir) or not os.listdir(cfg.ckpt_dir)


@pytest.mark.slow
def test_load_imagenet_trunks(tmp_path):
    """--weights_init pretrained: torchvision ImageNet state dict initializes
    the three ResNet trunks; the pose trunk conv1 is tiled and divided by the
    image count (`resnet_encoder.py:63-67`); decoders keep their fresh init;
    the frozen fc head keys are ignored."""
    torch.manual_seed(11)
    net = TorchResNet18()
    sd = net.state_dict()
    sd["fc.weight"] = torch.randn(1000, 512)  # torchvision head — ignored
    sd["fc.bias"] = torch.randn(1000)
    path = tmp_path / "resnet18-imagenet.pth"
    torch.save(sd, path)

    t = Trainer(CFG, Loader(CFG), num_devices=1,
                logger=MetricLogger(sink=lambda m, s: None))
    before = jax.device_get(t.state).params
    depth_before = _leaf_norm(before["depth"])
    t.load_imagenet(str(path))
    params = jax.device_get(t.state).params

    w_t = sd["conv1.weight"].numpy()  # (64, 3, 7, 7)
    # mono trunk conv1 == converted torch conv1
    got = np.asarray(params["mono_encoder"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, w_t.transpose(2, 3, 1, 0), rtol=1e-6)
    # matching-encoder trunk too
    got_m = np.asarray(params["encoder"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(got_m, w_t.transpose(2, 3, 1, 0), rtol=1e-6)
    # pose trunk: 6-ch conv1 = [w, w]/2 along the input-channel axis
    got_p = np.asarray(params["pose_encoder"]["encoder"]["conv1"]["kernel"])
    assert got_p.shape[2] == 6
    np.testing.assert_allclose(got_p[:, :, :3], w_t.transpose(2, 3, 1, 0) / 2,
                               rtol=1e-6)
    np.testing.assert_allclose(got_p[:, :, 3:], got_p[:, :, :3], rtol=1e-6)
    # decoders untouched
    assert _leaf_norm(params["depth"]) == depth_before
