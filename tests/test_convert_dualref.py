"""DualRefine `depth_pose.pth` converter parity.

Torch twins of the public architectures (HRNet-W18, DIFFNet attention
decoder, RAFT-style update block with weight norm, GN uncertainty head) are
built here with the reference's exact state-dict key layout
(`dualrefine/networks/depth_pose.py:24-172`), randomized, converted with
`mal_tpu.convert.dualref`, and compared forward-for-forward against the flax
modules. A final test assembles the complete state dict and checks the
converted tree drops into `DEQDepthPose.init`'s structure exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mal_tpu.config import Config
from mal_tpu.convert.dualref import (
    convert_depth_pose,
    convert_hr_decoder,
    convert_hrnet_trunk,
    convert_pose_weights,
    convert_update_block,
)
from mal_tpu.dualref.hr_decoder import HRDepthDecoder
from mal_tpu.dualref.hrnet import HRNet
from mal_tpu.dualref.model import DEQDepthPose, _FeatHead, _PoseWeights
from mal_tpu.dualref.update import SmallUpdateBlock


def _seed_bn(m: nn.Module, rng: np.random.RandomState):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.5, mod.running_mean.shape).astype(np.float32)))
            mod.running_var.copy_(torch.from_numpy(
                rng.uniform(0.5, 2.0, mod.running_var.shape).astype(np.float32)))
            mod.weight.data.copy_(torch.from_numpy(
                rng.uniform(0.5, 1.5, mod.weight.shape).astype(np.float32)))
            mod.bias.data.copy_(torch.from_numpy(
                rng.normal(0, 0.2, mod.bias.shape).astype(np.float32)))


# --- torch HRNet-W18 twin (public architecture) -----------------------------
class TBasic(nn.Module):
    def __init__(self, cin, c, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, c, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(x + y)


class TBottleneck(nn.Module):
    def __init__(self, cin, width, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(width * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width * 4, 1, bias=False),
                nn.BatchNorm2d(width * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


def _conv_bn_relu(cin, cout, stride):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(inplace=True))


class THRModule(nn.Module):
    """HighResolutionModule twin: per-branch blocks + SUM fusion
    (`hr_encoder.py:141-290`)."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        n = len(channels)
        self.branches = nn.ModuleList([
            nn.Sequential(*[TBasic(c, c) for _ in range(4)])
            for c in channels])
        fuse_layers = []
        for i in range(n):
            row = []
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i])))
                elif j == i:
                    row.append(None)
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = channels[i] if last else channels[j]
                        mods = [nn.Conv2d(channels[j] if k == 0 else channels[j],
                                          cout, 3, 2, 1, bias=False),
                                nn.BatchNorm2d(cout)]
                        if not last:
                            mods.append(nn.ReLU(inplace=True))
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
            fuse_layers.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fuse_layers)

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(len(xs)):
            y = xs[0] if i == 0 else self.fuse_layers[i][0](xs[0])
            for j in range(1, len(xs)):
                if j == i:
                    y = y + xs[j]
                elif j > i:
                    y = y + F.interpolate(
                        self.fuse_layers[i][j](xs[j]),
                        size=xs[i].shape[-2:], mode="bilinear",
                        align_corners=False)
                else:
                    y = y + self.fuse_layers[i][j](xs[j])
            outs.append(F.relu(y))
        return outs


class THRNet18(nn.Module):
    """DepthPose's `cnet_*` attribute layout (`depth_pose.py:117-130`)."""

    def __init__(self, w=18):
        super().__init__()
        ch2 = (w, 2 * w)
        ch3 = (w, 2 * w, 4 * w)
        ch4 = (w, 2 * w, 4 * w, 8 * w)
        self.cnet_layer0a = nn.Sequential(
            nn.Conv2d(3, 64, 3, 2, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True))
        self.cnet_layer0b = nn.Sequential(
            nn.Conv2d(64, 64, 3, 2, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True))
        self.cnet_layer1 = nn.Sequential(
            TBottleneck(64, 64, True), TBottleneck(256, 64, False),
            TBottleneck(256, 64, False), TBottleneck(256, 64, False))
        self.cnet_transition1 = nn.ModuleList([
            _conv_bn_relu(256, ch2[0], 1),
            nn.Sequential(_conv_bn_relu(256, ch2[1], 2))])
        self.cnet_stage2 = nn.Sequential(THRModule(ch2))
        self.cnet_transition2 = nn.ModuleList([
            None, None, nn.Sequential(_conv_bn_relu(ch2[1], ch3[2], 2))])
        self.cnet_stage3 = nn.Sequential(*[THRModule(ch3) for _ in range(4)])
        self.cnet_transition3 = nn.ModuleList([
            None, None, None, nn.Sequential(_conv_bn_relu(ch3[2], ch4[3], 2))])
        self.cnet_stage4 = nn.Sequential(*[THRModule(ch4) for _ in range(3)])

    def forward(self, x):
        stem1 = self.cnet_layer0a(x)
        stem2 = self.cnet_layer0b(stem1)
        z = self.cnet_layer1(stem2)
        xs = [self.cnet_transition1[0](z), self.cnet_transition1[1](z)]
        s2 = self.cnet_stage2(xs)
        xs = s2 + [self.cnet_transition2[2](s2[-1])]
        s3 = self.cnet_stage3(xs)
        xs = s3 + [self.cnet_transition3[3](s3[-1])]
        s4 = self.cnet_stage4(xs)
        return {"stem1": stem1, "stem2": stem2,
                "list18": [stem2, s2[0], s3[0], s4[0]],
                "list36": [s2[1], s3[1], s4[1]],
                "list72": [s3[2], s4[2]], "x144": s4[3]}


def _t2j(x):
    return np.asarray(x.detach().permute(0, 2, 3, 1).numpy())


@pytest.mark.slow
def test_hrnet_trunk_forward_parity():
    torch.manual_seed(0)
    tnet = THRNet18().eval()
    with torch.no_grad():
        _seed_bn(tnet, np.random.RandomState(0))
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_hrnet_trunk(sd)

    x = np.random.RandomState(1).uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32)
    taps = HRNet(base_width=18).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ttaps = tnet(torch.from_numpy(x).permute(0, 3, 1, 2))

    np.testing.assert_allclose(np.asarray(taps["stem2"]),
                               _t2j(ttaps["stem2"]), atol=2e-4)
    for key in ("list18", "list36", "list72"):
        for ours, ref in zip(taps[key], ttaps[key]):
            np.testing.assert_allclose(np.asarray(ours), _t2j(ref), atol=3e-3)
    np.testing.assert_allclose(np.asarray(taps["x144"]),
                               _t2j(ttaps["x144"]), atol=3e-3)


# --- DIFFNet attention decoder twin -----------------------------------------
class TChannelAttention(nn.Module):
    def __init__(self, c, ratio=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(c, max(c // ratio, 1), bias=False), nn.ReLU(inplace=True),
            nn.Linear(max(c // ratio, 1), c, bias=False))

    def forward(self, x):
        b, c = x.shape[:2]
        w = self.fc(F.adaptive_avg_pool2d(x, 1).view(b, c)).view(b, c, 1, 1)
        return torch.sigmoid(w) * x


class TAttention(nn.Module):
    def __init__(self, chigh, clow, cout):
        super().__init__()
        self.ca = TChannelAttention(chigh + clow)
        self.conv_se = nn.Conv2d(chigh + clow, cout, 3, 1, 1)

    def forward(self, high, lows, relu=True):
        f = [F.interpolate(high, scale_factor=2, mode="nearest")] + list(lows)
        f = self.ca(torch.cat(f, 1))
        out = self.conv_se(f)
        return F.relu(out) if relu else out


class TConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return F.elu(self.conv.conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))


class TDispConv(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.conv = nn.Conv2d(cin, 1, 3)

    def forward(self, x):
        return self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect"))


class THRDecoder(nn.Module):
    """`HRDepthDecoder.convs` ModuleDict key layout."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleDict({
            "72": TAttention(144, 144, 256),
            "36": TAttention(256, 108, 128),
            "18": TAttention(128, 118, 64),
            "9": TAttention(64, 64, 32),
            "up_x9_0": TConvBlock(32, 16),
            "up_x9_1": TConvBlock(16, 16),
            "dispConvScale0": TDispConv(16),
            "dispConvScale1": TDispConv(32),
            "dispConvScale2": TDispConv(64),
            "dispConvScale3": TDispConv(128),
        })

    def forward(self, taps):
        x72 = self.convs["72"](taps["x144"], taps["list72"])
        x36 = self.convs["36"](x72, taps["list36"])
        x18 = self.convs["18"](x36, taps["list18"], relu=False)
        relu_x18 = F.relu(x18)
        x9 = self.convs["9"](relu_x18, [taps["stem1"]])
        x6 = self.convs["up_x9_1"](F.interpolate(
            self.convs["up_x9_0"](x9), scale_factor=2, mode="nearest"))
        return {0: torch.sigmoid(self.convs["dispConvScale0"](x6)),
                1: torch.sigmoid(self.convs["dispConvScale1"](x9)),
                2: torch.sigmoid(self.convs["dispConvScale2"](relu_x18)),
                3: torch.sigmoid(self.convs["dispConvScale3"](x36))}


def test_hr_decoder_forward_parity():
    torch.manual_seed(1)
    tdec = THRDecoder().eval()
    sd = {k: v.numpy() for k, v in tdec.state_dict().items()}
    params = convert_hr_decoder(sd, prefix="convs.")

    rng = np.random.RandomState(2)
    h, w = 8, 16  # 1/4-res tap grid (divisible by 8 for the x144 tap)
    taps_np = {
        "stem1": rng.normal(0, 1, (1, 2 * h, 2 * w, 64)).astype(np.float32),
        "list18": [rng.normal(0, 1, (1, h, w, c)).astype(np.float32)
                   for c in (64, 18, 18, 18)],
        "list36": [rng.normal(0, 1, (1, h // 2, w // 2, 36)).astype(np.float32)
                   for _ in range(3)],
        "list72": [rng.normal(0, 1, (1, h // 4, w // 4, 72)).astype(np.float32)
                   for _ in range(2)],
        "x144": rng.normal(0, 1, (1, h // 8, w // 8, 144)).astype(np.float32),
    }
    # stem2 == list18[0] for the decoder input contract
    taps_np["stem2"] = taps_np["list18"][0]

    disps, _ = HRDepthDecoder().apply(
        {"params": params}, jax.tree.map(jnp.asarray, taps_np))

    def tt(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    ttaps = {"stem1": tt(taps_np["stem1"]),
             "list18": [tt(f) for f in taps_np["list18"]],
             "list36": [tt(f) for f in taps_np["list36"]],
             "list72": [tt(f) for f in taps_np["list72"]],
             "x144": tt(taps_np["x144"])}
    with torch.no_grad():
        tdisps = tdec(ttaps)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(disps[k]), _t2j(tdisps[k]),
                                   atol=2e-5)


# --- update block twin (weight norm) ----------------------------------------
class TUpdateBlock(nn.Module):
    """`SmallUpdateBlock` twin (`update.py:128-163`), hidden=input=64,
    corr 51 channels (radius 8 x 3 levels), torch weight_norm(dim=0)."""

    def __init__(self, cor_planes=51, hidden=64, input_dim=64):
        super().__init__()
        enc = nn.Module()
        enc.convc1 = nn.Conv2d(cor_planes, 96, 1)
        enc.convc2 = nn.Conv2d(96, 64, 3, padding=1)
        enc.convf1 = nn.Conv2d(1, 64, 7, padding=3)
        enc.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        enc.convp1 = nn.Linear(6, 128)   # dead params (`update.py:97-98`)
        enc.convp2 = nn.Linear(128, 128)
        enc.conv = nn.Conv2d(96, 63, 3, padding=1)
        self.encoder = enc

        gru = nn.Module()
        gru.conv_net = nn.Conv2d(hidden, 2 * hidden, 3, padding=1)
        gru.conv_inp = nn.Conv2d(64 + input_dim, 2 * hidden, 3, padding=1)
        gru.convq = nn.Conv2d(hidden + 64 + input_dim, hidden, 3, padding=1)
        gru.w = nn.Conv2d(hidden, hidden, 1)
        gru.convz_glo = nn.Conv2d(hidden, hidden, 1)
        gru.convr_glo = nn.Conv2d(hidden, hidden, 1)
        gru.convq_glo = nn.Conv2d(hidden, hidden, 1)
        self.gru = gru

        head = nn.Module()
        head.conv1 = nn.Conv2d(hidden, 64, 3, padding=1)
        head.conv2 = nn.Conv2d(64, 1, 3, padding=1)
        self.conv_head = head

        self.mask = nn.Sequential(nn.Conv2d(hidden, 64, 3, padding=1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv2d(64, 16 * 9, 1))
        self.weight = nn.Sequential(nn.Conv2d(hidden, 32, 3, padding=1),
                                    nn.ReLU(inplace=True),
                                    nn.Conv2d(32, 1, 1), nn.Sigmoid())
        self.hidden = hidden

    def wnorm(self):
        for mod, names in ((self.encoder, ("convc1", "convc2", "convf1",
                                           "convf2", "conv")),
                           (self.gru, ("conv_net", "conv_inp", "w",
                                       "convz_glo", "convr_glo", "convq_glo",
                                       "convq")),
                           (self.conv_head, ("conv1", "conv2"))):
            for n in names:
                setattr(mod, n, nn.utils.weight_norm(getattr(mod, n), dim=0))

    def forward(self, net, inp, corr, depths):
        cor = F.relu(self.encoder.convc1(corr))
        cor = F.relu(self.encoder.convc2(cor))
        dep = F.relu(self.encoder.convf1(depths))
        dep = F.relu(self.encoder.convf2(dep))
        out = F.relu(self.encoder.conv(torch.cat([cor, dep], 1)))
        motion = torch.cat([out, depths], 1)

        x = torch.cat([inp, motion], 1)
        h = net
        glo = torch.sigmoid(self.gru.w(h)) * h
        glo = glo.mean((2, 3), keepdim=True)
        z_net, r_net = self.gru.conv_net(h).split(self.hidden, 1)
        z_inp, r_inp = self.gru.conv_inp(x).split(self.hidden, 1)
        z = torch.sigmoid(z_net + z_inp + self.gru.convz_glo(glo))
        r = torch.sigmoid(r_net + r_inp + self.gru.convr_glo(glo))
        q = torch.tanh(self.gru.convq(torch.cat([r * h, x], 1))
                       + self.gru.convq_glo(glo))
        net = (1 - z) * h + z * q

        delta = self.conv_head.conv2(F.relu(self.conv_head.conv1(net)))
        return net, delta


def test_update_block_forward_parity():
    torch.manual_seed(3)
    tub = TUpdateBlock()
    tub.wnorm()
    tub.eval()
    sd = {k: v.detach().numpy() for k, v in tub.state_dict().items()}
    params = convert_update_block(sd, prefix="")

    rng = np.random.RandomState(4)
    net = rng.normal(0, 1, (2, 6, 8, 64)).astype(np.float32)
    inp = rng.normal(0, 1, (2, 6, 8, 64)).astype(np.float32)
    corr = rng.normal(0, 1, (2, 6, 8, 51)).astype(np.float32)
    depth = rng.uniform(1, 10, (2, 6, 8, 1)).astype(np.float32)

    jub = SmallUpdateBlock(input_dim=64, hidden_dim=64)
    (jnet, jdelta), _ = jub.apply(
        {"params": params}, jnp.asarray(net), jnp.asarray(inp),
        jnp.asarray(corr), jnp.asarray(depth), mutable=[])
    jmask = jub.apply({"params": params}, jnp.asarray(jnet),
                      method=SmallUpdateBlock.upsample_mask)
    jweight = jub.apply({"params": params}, jnp.asarray(jnet),
                        method=SmallUpdateBlock.pose_weight)

    def tt(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        tnet, tdelta = tub(tt(net), tt(inp), tt(corr), tt(depth))
        tmask = tub.mask(tnet)
        tweight = tub.weight(tnet)
    np.testing.assert_allclose(np.asarray(jnet), _t2j(tnet), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jdelta), _t2j(tdelta), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jmask), _t2j(tmask), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jweight), _t2j(tweight), atol=2e-5)


# --- feat head + pose-weight twins ------------------------------------------
class TResBlockIN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1)
        self.norm1 = nn.InstanceNorm2d(c)
        self.norm2 = nn.InstanceNorm2d(c)

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        return F.relu(x + y)


class TResBlockBN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1)
        self.norm1 = nn.BatchNorm2d(c)
        self.norm2 = nn.BatchNorm2d(c)

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        return F.relu(x + y)


def test_feat_head_forward_parity():
    torch.manual_seed(5)
    thead = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1)).eval()
    sd = {k: v.numpy() for k, v in thead.state_dict().items()}
    from mal_tpu.convert.dualref import _feat_head
    params = _feat_head({"h." + k: v for k, v in sd.items()}, "h")

    x = np.random.RandomState(6).normal(0, 1, (2, 8, 12, 64)).astype(np.float32)
    out = _FeatHead(64).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        tout = thead(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out), _t2j(tout), atol=2e-5)


def test_pose_weights_forward_parity():
    torch.manual_seed(7)

    class TPoseUpdate(nn.Module):
        def __init__(self, c=64):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(c)  # orphan (`utils.py:262-270`)
            self.weights = nn.Sequential(
                nn.Sequential(TResBlockBN(c), TResBlockBN(c)),
                nn.Conv2d(c, 1, 1, bias=False), nn.ReLU(inplace=True))
            self.feats = nn.Sequential(
                nn.Sequential(TResBlockBN(c), TResBlockBN(c)),
                nn.Conv2d(c, 16, 1, bias=False))

    tpu_ = TPoseUpdate().eval()
    with torch.no_grad():
        _seed_bn(tpu_, np.random.RandomState(8))
    sd = {"pose_update." + k: v.numpy() for k, v in tpu_.state_dict().items()}
    params, stats = convert_pose_weights(sd)

    x = np.random.RandomState(9).normal(0, 1, (2, 8, 12, 64)).astype(np.float32)
    out = _PoseWeights().apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False)
    with torch.no_grad():
        tout = tpu_.weights(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(out), _t2j(tout), atol=2e-5)


# --- full state dict -> model structure -------------------------------------
class TResnetBasic(nn.Module):
    """torchvision-style BasicBlock (bias-free convs + downsample)."""

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


class TPoseTrunk(nn.Module):
    """resnet18 multi-image pose trunk key layout (6ch conv1)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(6, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TResnetBasic(64, 64), TResnetBasic(64, 64))
        self.layer2 = nn.Sequential(TResnetBasic(64, 128, 2), TResnetBasic(128, 128))
        self.layer3 = nn.Sequential(TResnetBasic(128, 256, 2), TResnetBasic(256, 256))
        self.layer4 = nn.Sequential(TResnetBasic(256, 512, 2), TResnetBasic(512, 512))


@pytest.mark.slow
def test_full_depth_pose_conversion_structure():
    """Assemble the complete `depth_pose.pth` state dict, convert, and verify
    it matches `DEQDepthPose.init`'s params/batch_stats tree exactly
    (structure AND shapes) after adding the expected extras."""
    torch.manual_seed(10)
    full = THRNet18()
    full.decoder = nn.Module()
    full.decoder.convs = THRDecoder().convs
    full.conv2 = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    full.context = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    full.hidden = nn.Sequential(TResBlockIN(64), nn.Conv2d(64, 64, 3, padding=1))
    ub = TUpdateBlock()
    ub.wnorm()
    full.update_block = ub
    pu = nn.Module()
    pu.norm1 = nn.BatchNorm2d(64)
    pu.weights = nn.Sequential(
        nn.Sequential(TResBlockBN(64), TResBlockBN(64)),
        nn.Conv2d(64, 1, 1, bias=False), nn.ReLU())
    full.pose_update = pu
    full.reproject_2 = nn.Module()
    full.reproject_2.delta = nn.Parameter(torch.ones(1))
    full.reproject_2.delta_p = nn.Parameter(torch.ones(1))
    pnets = nn.ModuleList()
    for _ in range(3):
        trunk = TPoseTrunk()
        convs = nn.ModuleDict({
            "squeeze": nn.Conv2d(512, 256, 1),
            "pose0": nn.Conv2d(256, 256, 3, 1, 1),
            "pose1": nn.Conv2d(256, 256, 3, 1, 1),
            "pose2": nn.Conv2d(256, 6, 1)})
        pnets.append(nn.ModuleList([trunk, convs]))
    full.pnets = pnets

    sd = {k: v.detach().numpy() for k, v in full.state_dict().items()}
    params, stats, extras = convert_depth_pose(sd)

    cfg = Config(height=64, width=96, method="dualrefine", frame_ids=(0, -1),
                 deq_iters=2, corr_radius=8, corr_levels=3)
    model = DEQDepthPose(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 96, 3))
    K = jnp.eye(4)[None].at[0, 0, 0].set(60.0).at[0, 1, 1].set(60.0) \
        .at[0, 0, 2].set(48.0).at[0, 1, 2].set(32.0)
    ref = model.init(rng, img, img, K, invert=True, train=False)

    ref_p = jax.tree.map(lambda x: x.shape, ref["params"])
    got_p = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert ref_p == got_p, "params structure/shape mismatch"
    ref_s = jax.tree.map(lambda x: x.shape, ref.get("batch_stats", {}))
    got_s = jax.tree.map(lambda x: np.asarray(x).shape, stats)
    assert ref_s == got_s, "batch_stats structure/shape mismatch"
