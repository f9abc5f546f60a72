"""Model shape / init tests (small config for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import DepthDecoder, MALModel, PoseDecoder
from mal_tpu.models.resnet import ResNetFeatures


SMALL = Config(height=64, width=96, num_depth_bins=16, batch_size=2)


def test_resnet18_pyramid_shapes():
    model = ResNetFeatures(num_layers=18)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(vars_, x)
    shapes = [f.shape for f in feats]
    assert shapes == [(1, 32, 48, 64), (1, 16, 24, 64), (1, 8, 12, 128),
                      (1, 4, 6, 256), (1, 2, 3, 512)]


def test_resnet18_param_count_matches_torchvision():
    """Same trunk as torchvision resnet18 minus the fc head."""
    model = ResNetFeatures(num_layers=18)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(vars_["params"]))
    # torchvision resnet18: 11,689,512 params total, fc = 512*1000+1000
    assert n_params == 11689512 - 513000


def test_depth_decoder_output_shape():
    feats = [jnp.zeros((2, 32, 48, 64)), jnp.zeros((2, 16, 24, 64)),
             jnp.zeros((2, 8, 12, 128)), jnp.zeros((2, 4, 6, 256)),
             jnp.zeros((2, 2, 3, 512))]
    dec = DepthDecoder()
    vars_ = dec.init(jax.random.PRNGKey(0), feats)
    disp = dec.apply(vars_, feats)
    assert disp.shape == (2, 64, 96, 1)
    assert float(disp.min()) >= 0.0 and float(disp.max()) <= 1.0


def test_pose_decoder_shapes_and_scale():
    dec = PoseDecoder(num_frames_to_predict_for=2)
    feat = jnp.ones((3, 2, 3, 512))
    vars_ = dec.init(jax.random.PRNGKey(0), feat)
    aa, t = dec.apply(vars_, feat)
    assert aa.shape == (3, 2, 1, 3) and t.shape == (3, 2, 1, 3)
    # 0.01 scaling keeps initial outputs tiny
    assert float(jnp.abs(aa).max()) < 0.1


def test_mal_model_forward_shapes():
    cfg = SMALL
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.1),
                           jnp.asarray(10.0), rng, train=True)
    outputs = model.apply(variables, batch, jnp.asarray(0.1),
                          jnp.asarray(10.0), rng, train=False,
                          mutable=False)
    B, H, W = 2, cfg.height, cfg.width
    assert outputs["disp"].shape == (B, H, W, 1)
    assert outputs["mono_disp"].shape == (B, H, W, 1)
    assert outputs["lowest_cost"].shape == (B, H, W)
    assert outputs["consistency_mask"].shape == (B, H, W)
    for f in (-1, 1):
        assert outputs[f"cam_T_cam/0/{f}"].shape == (B, 4, 4)
    assert outputs["augmentation_mask"].shape == (B, 1, 1, 1)
    # poses are near identity at init (0.01-scaled heads)
    T = np.asarray(outputs["cam_T_cam/0/1"])
    np.testing.assert_allclose(T[0], np.eye(4), atol=0.2)
