"""Weight-converter parity: torch modules (standard torchvision/monodepth2
architectures, built here) -> converted flax params -> identical outputs.

This is the strongest available stand-in for real-checkpoint parity until the
released `many_k` weights are on disk: it proves conv/BN/pool/pad/activation
semantics and the key mapping are exact.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mal_tpu.convert.torch_weights import (
    convert_depth_decoder,
    convert_pose_decoder,
    convert_resnet_trunk,
)
from mal_tpu.models.depth_decoder import DepthDecoder
from mal_tpu.models.pose_decoder import PoseDecoder
from mal_tpu.models.resnet import ResNetFeatures


# --- standard torchvision-style resnet18 (public architecture) -------------
class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
        self.layer4 = nn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))

    def forward(self, x):
        f0 = F.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(f0))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


def _randomize_bn_stats(model: nn.Module, rng: np.random.RandomState):
    """Make running stats non-trivial so eval-mode BN is actually tested."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, m.running_var.shape).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(
                rng.normal(0, 0.2, m.bias.shape).astype(np.float32)))


def test_resnet18_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchResNet18().eval()
    with torch.no_grad():
        _randomize_bn_stats(tmodel, np.random.RandomState(0))

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_trunk(sd, 18)

    x = np.random.RandomState(1).uniform(-1, 1, (2, 64, 96, 3)).astype(np.float32)
    jmodel = ResNetFeatures(num_layers=18)
    feats = jmodel.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(x), train=False)

    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    for ours, ref in zip(feats, tfeats):
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)


# --- monodepth2-style decoder (public architecture) -------------------------
class TorchConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.conv = nn.Conv2d(cin, cout, 3)
        self.pad = nn.ReflectionPad2d(1)

    def forward(self, x):
        return F.elu(self.conv.conv(self.pad(x)))


class TorchDispConv(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.conv = nn.Conv2d(cin, 1, 3)
        self.pad = nn.ReflectionPad2d(1)

    def forward(self, x):
        return self.conv(self.pad(x))


class TorchDepthDecoder(nn.Module):
    def __init__(self, num_ch_enc=(64, 64, 128, 256, 512)):
        super().__init__()
        num_ch_dec = [16, 32, 64, 128, 256]
        mods = []
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            mods.append(TorchConvBlock(cin, num_ch_dec[i]))
        mods.append(TorchDispConv(num_ch_dec[0]))
        self.decoder = nn.ModuleList(mods)

    def forward(self, feats):
        x = feats[-1]
        k = 0
        for i in range(4, -1, -1):
            x = self.decoder[k](x); k += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[k](x); k += 1
        return torch.sigmoid(self.decoder[10](x))


def test_depth_decoder_forward_parity():
    torch.manual_seed(1)
    tdec = TorchDepthDecoder().eval()
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    params = convert_depth_decoder(sd)

    rng = np.random.RandomState(2)
    shapes = [(2, 32, 48, 64), (2, 16, 24, 64), (2, 8, 12, 128),
              (2, 4, 6, 256), (2, 2, 3, 512)]
    feats = [rng.normal(0, 1, s).astype(np.float32) for s in shapes]

    jdec = DepthDecoder()
    disp = jdec.apply({"params": params}, [jnp.asarray(f) for f in feats])

    with torch.no_grad():
        tdisp = tdec([torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats])
    np.testing.assert_allclose(np.asarray(disp),
                               tdisp.permute(0, 2, 3, 1).numpy(), atol=2e-5)


class TorchPoseDecoder(nn.Module):
    def __init__(self, nf=2):
        super().__init__()
        self.nf = nf
        self.net = nn.ModuleList([
            nn.Conv2d(512, 256, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 6 * nf, 1)])

    def forward(self, f):
        out = F.relu(self.net[0](f))
        out = F.relu(self.net[1](out))
        out = F.relu(self.net[2](out))
        out = self.net[3](out)
        out = out.mean(3).mean(2)
        out = 0.01 * out.view(-1, self.nf, 1, 6)
        return out[..., :3], out[..., 3:]


def test_pose_decoder_forward_parity():
    torch.manual_seed(2)
    tdec = TorchPoseDecoder().eval()
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    params = convert_pose_decoder(sd)

    feat = np.random.RandomState(3).normal(0, 1, (3, 2, 3, 512)).astype(np.float32)
    jdec = PoseDecoder(num_frames_to_predict_for=2)
    aa, t = jdec.apply({"params": params}, jnp.asarray(feat))
    with torch.no_grad():
        taa, tt = tdec(torch.from_numpy(feat).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(aa), taa.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), tt.numpy(), atol=1e-6)


class TorchMatchingEncoderLayout(nn.Module):
    """Mimics the reference's Sequential-wrapped state-dict layout
    (`resnet_encoder.py:106-119`): layer0=(conv1,bn1,relu),
    layer1=(maxpool, blocks), layer2-4 plain, reduce_conv=(conv,relu)."""

    def __init__(self, D=8):
        super().__init__()
        trunk = TorchResNet18()
        self.layer0 = nn.Sequential(trunk.conv1, trunk.bn1, nn.ReLU())
        self.layer1 = nn.Sequential(trunk.maxpool, trunk.layer1)
        self.layer2 = trunk.layer2
        self.layer3 = trunk.layer3
        self.layer4 = trunk.layer4
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(64 + D, 64, 3, 1, 1), nn.ReLU())

    def features(self, x):
        f0 = self.layer0(x)
        f1 = self.layer1(f0)
        return f0, f1

    def deep(self, fused):
        f2 = self.layer2(fused)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return f2, f3, f4


def test_matching_encoder_converter_parity():
    from mal_tpu.convert.torch_weights import convert_matching_encoder
    from mal_tpu.models.resnet import ResNetFeatures

    torch.manual_seed(3)
    D = 8
    tenc = TorchMatchingEncoderLayout(D).eval()
    with torch.no_grad():
        _randomize_bn_stats(tenc, np.random.RandomState(4))
    sd = {k: v.numpy() for k, v in tenc.state_dict().items()}
    sd["min_depth_bin"] = np.float32(0.3)
    sd["max_depth_bin"] = np.float32(12.0)
    params, stats, extras = convert_matching_encoder(sd, 18)
    assert float(extras["min_depth_bin"]) == np.float32(0.3)

    x = np.random.RandomState(5).uniform(-1, 1, (2, 64, 96, 3)).astype(np.float32)
    trunk = ResNetFeatures(18)
    tvars = {"params": params["encoder"], "batch_stats": stats["encoder"]}
    feats = trunk.apply(tvars, jnp.asarray(x), train=False, stages=2)

    with torch.no_grad():
        tf0, tf1 = tenc.features(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(feats[0]),
                               tf0.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(feats[1]),
                               tf1.permute(0, 2, 3, 1).numpy(), atol=2e-4)

    # fused stage-2 entry point + deep stages
    fused = np.random.RandomState(6).uniform(-1, 1, (2, 16, 24, 64)).astype(np.float32)
    deep = trunk.apply(tvars, jnp.asarray(fused), train=False, stages=5,
                       start_stage=2)
    with torch.no_grad():
        tf2, tf3, tf4 = tenc.deep(torch.from_numpy(fused).permute(0, 3, 1, 2))
    for ours, ref in zip(deep, (tf2, tf3, tf4)):
        np.testing.assert_allclose(np.asarray(ours),
                                   ref.permute(0, 2, 3, 1).numpy(), atol=3e-4)

    # reduce_conv weights land in the right slot
    import jax.lax as lax
    rc_in = np.random.RandomState(7).uniform(-1, 1, (2, 16, 24, 64 + D)).astype(np.float32)
    w = params["reduce_conv"]["kernel"]
    b = params["reduce_conv"]["bias"]
    ours_rc = jax.nn.relu(lax.conv_general_dilated(
        jnp.asarray(rc_in), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + jnp.asarray(b))
    with torch.no_grad():
        ref_rc = tenc.reduce_conv(torch.from_numpy(rc_in).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(ours_rc),
                               ref_rc.permute(0, 2, 3, 1).numpy(), atol=2e-5)


def test_full_checkpoint_dir_conversion(tmp_path):
    """Build a reference-layout checkpoint dir (per-net .pth files with the
    reference key layouts) and ingest it with `convert_mal_checkpoint_dir`,
    then run the full MALModel eval forward with the converted weights."""
    from mal_tpu.config import Config
    from mal_tpu.convert.torch_weights import convert_mal_checkpoint_dir
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel

    torch.manual_seed(9)
    D = 16

    # per-net torch modules with the reference's state-dict layouts
    enc = TorchMatchingEncoderLayout(D).eval()
    depth = TorchDepthDecoder().eval()
    mono_depth = TorchDepthDecoder().eval()
    pose_dec = TorchPoseDecoder(nf=2).eval()

    class Wrap(nn.Module):  # ResnetEncoder stores the trunk under .encoder
        def __init__(self, num_input_images=1):
            super().__init__()
            self.encoder = TorchResNet18()
            if num_input_images > 1:
                self.encoder.conv1 = nn.Conv2d(3 * num_input_images, 64, 7, 2,
                                               3, bias=False)

    mono_enc = Wrap().eval()
    pose_enc = Wrap(num_input_images=2).eval()

    ck = tmp_path / "KITTI_MR"
    ck.mkdir()
    enc_sd = enc.state_dict()
    enc_sd["min_depth_bin"] = torch.tensor(0.42)
    enc_sd["max_depth_bin"] = torch.tensor(8.5)
    torch.save(enc_sd, ck / "encoder.pth")
    torch.save(depth.state_dict(), ck / "depth.pth")
    torch.save(mono_enc.state_dict(), ck / "mono_encoder.pth")
    torch.save(mono_depth.state_dict(), ck / "mono_depth.pth")
    torch.save(pose_enc.state_dict(), ck / "pose_encoder.pth")
    torch.save(pose_dec.state_dict(), ck / "pose.pth")

    params, stats, extras = convert_mal_checkpoint_dir(str(ck), 18)
    assert abs(float(extras["min_depth_bin"]) - 0.42) < 1e-6

    cfg = Config(height=64, width=96, num_depth_bins=D, batch_size=1,
                 use_pallas=False)
    model = MALModel(cfg)
    batch = synthetic_batch(cfg, jax.random.PRNGKey(0), batch_size=1)
    # converted params must cover the full init structure
    init_vars = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           jnp.asarray(0.4), jnp.asarray(8.0),
                           jax.random.PRNGKey(0), train=False)
    init_paths = set(map(jax.tree_util.keystr,
                         jax.tree_util.tree_flatten_with_path(init_vars["params"])[0][0:None]))
    conv_paths = set(map(jax.tree_util.keystr,
                         jax.tree_util.tree_flatten_with_path(params)[0][0:None]))
    conv_paths = {p for p, _ in
                  [(jax.tree_util.keystr(k), v) for k, v in
                   jax.tree_util.tree_flatten_with_path(params)[0]]}
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
    assert conv_paths == init_paths, (
        sorted(init_paths - conv_paths)[:5], sorted(conv_paths - init_paths)[:5])

    out = model.apply({"params": params, "batch_stats": stats}, batch,
                      jnp.asarray(float(extras["min_depth_bin"])),
                      jnp.asarray(float(extras["max_depth_bin"])),
                      method=MALModel.eval_forward, mutable=False)
    assert out["disp"].shape == (1, 64, 96, 1)
    assert bool(jnp.isfinite(out["disp"]).all())
    assert bool(jnp.isfinite(out["mono_disp"]).all())


class TorchDYJ(nn.Module):
    """ResnetEncoderDYJ twin: 9-ch trunk + net=[squeeze,pose0,pose1,pose2]
    (`resnet_encoder.py:400-476`)."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchResNet18()
        self.encoder.conv1 = nn.Conv2d(9, 64, 7, 2, 3, bias=False)
        self.net = nn.ModuleList([
            nn.Conv2d(512, 256, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 12, 1)])

    def forward(self, frames):
        # frames: (B, 3, T, H, W); einops 'b c t h w -> b (c t) h w'
        B = frames.shape[0]
        x = frames.reshape(B, 9, *frames.shape[-2:])
        x = (x - 0.45) / 0.225
        f = self.encoder(x)[-1]
        out = F.relu(self.net[0](f))
        out = F.relu(self.net[1](out))
        out = F.relu(self.net[2](out))
        out = self.net[3](out)
        out = 0.01 * out.mean(3).mean(2).view(B, 2, 6)
        return out[..., :3], out[..., 3:]


def test_pose_dyj_forward_parity():
    from mal_tpu.convert.torch_weights import convert_pose_dyj
    from mal_tpu.models.encoders import ResnetEncoderDYJ

    torch.manual_seed(5)
    tdyj = TorchDYJ().eval()
    with torch.no_grad():
        _randomize_bn_stats(tdyj, np.random.RandomState(5))
    sd = {k: v.numpy() for k, v in tdyj.state_dict().items()}
    params, stats = convert_pose_dyj(sd)

    rng = np.random.RandomState(6)
    frames = rng.uniform(0, 1, (2, 3, 64, 96, 3)).astype(np.float32)
    aa, t = ResnetEncoderDYJ().apply({"params": params, "batch_stats": stats},
                                     jnp.asarray(frames), train=False)

    # torch layout (B, C, T, H, W), channel-major flatten matches einops
    tin = torch.from_numpy(frames).permute(0, 4, 1, 2, 3)
    with torch.no_grad():
        taa, tt = tdyj(tin)
    np.testing.assert_allclose(np.asarray(aa), taa.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), tt.numpy(), atol=1e-5)
