"""Mask2Former .pkl converter parity.

Torch twins of the public detectron2/Swin architectures with the exact
checkpoint key layout (`mask2former/modeling/backbone/swin.py`,
`modeling/pixel_decoder/msdeformattn.py`,
`modeling/transformer_decoder/mask2former_transformer_decoder.py`) are
randomized, converted with `mal_tpu.convert.mask2former`, and compared
forward-for-forward. The full-model test pickles a complete synthetic
checkpoint in detectron2's format and checks structural equality with
`Mask2Former.init`.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mal_tpu.convert.mask2former import (
    convert_mask2former_state,
    convert_pixel_decoder,
    convert_predictor,
    convert_swin,
    load_pkl,
)
from mal_tpu.segment.mask2former import Mask2Former
from mal_tpu.segment.swin import SwinTransformer
from mal_tpu.segment.transformer_decoder import MaskedTransformerDecoder


def _t2j(x):
    return np.asarray(x.detach().permute(0, 2, 3, 1).numpy())


# --- torch Swin twin (public architecture, key-exact) ------------------------
class TWindowAttention(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij"))
        flat = coords.flatten(1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0) + (ws - 1)
        idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]
        self.register_buffer("relative_position_index", idx)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (C // h) ** -0.5
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1)[None]
        if mask is not None:
            nm = mask.shape[0]
            attn = attn.view(B_ // nm, nm, h, N, N) + mask[None, :, None]
            attn = attn.view(B_, h, N, N)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.ws, self.shift = dim, ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        ws = self.ws
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        Hp = -(-H // ws) * ws
        Wp = -(-W // ws) * ws
        x = F.pad(x, (0, 0, 0, Wp - W, 0, Hp - H))
        shift = self.shift if min(Hp, Wp) > ws else 0
        if shift > 0:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img_mask = torch.zeros(1, Hp, Wp, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = img_mask.view(1, Hp // ws, ws, Wp // ws, ws, 1).permute(
                0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
            attn_mask = mw[:, None, :] - mw[:, :, None]
            attn_mask = torch.where(attn_mask != 0,
                                    torch.tensor(-100.0), torch.tensor(0.0))
        else:
            attn_mask = None
        wins = x.view(B, Hp // ws, ws, Wp // ws, ws, C).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        wins = self.attn(wins, attn_mask)
        x = wins.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if shift > 0:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = shortcut + x
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class TPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class TSwin(nn.Module):
    """D2SwinTransformer key layout (tiny config for test speed)."""

    def __init__(self, embed=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                 ws=7):
        super().__init__()
        self.depths, self.ws = depths, ws
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, embed, 4, 4)
        pe.norm = nn.LayerNorm(embed)
        self.patch_embed = pe
        layers = []
        dim = embed
        for s, d in enumerate(depths):
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                [TSwinBlock(dim, heads[s], ws, 0 if b % 2 == 0 else ws // 2)
                 for b in range(d)])
            if s < 3:
                layer.downsample = TPatchMerging(dim)
            layers.append(layer)
            if s < 3:
                dim *= 2
        self.layers = nn.ModuleList(layers)
        dim = embed
        for s in range(4):
            self.add_module(f"norm{s}", nn.LayerNorm(dim))
            dim *= 2

    def forward(self, x):
        x = self.patch_embed.proj(x)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        outs = {}
        dim = C
        for s in range(4):
            for blk in self.layers[s].blocks:
                x = blk(x, H, W)
            norm = getattr(self, f"norm{s}")
            outs[f"res{s + 2}"] = norm(x).view(B, H, W, -1).permute(
                0, 3, 1, 2)
            if s < 3:
                x = self.layers[s].downsample(x, H, W)
                H, W = H // 2, W // 2
        return outs


@pytest.mark.slow
def test_swin_tiny_forward_parity():
    torch.manual_seed(0)
    tswin = TSwin().eval()
    # randomize the rel-pos tables so the bias path is actually tested
    with torch.no_grad():
        for m in tswin.modules():
            if isinstance(m, TWindowAttention):
                m.relative_position_bias_table.normal_(0, 0.05)
    sd = {"backbone." + k: v.numpy() for k, v in tswin.state_dict().items()}
    params = convert_swin(sd, size="tiny")

    x = np.random.RandomState(1).uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32)
    outs = SwinTransformer(size="tiny").apply(
        {"params": params}, jnp.asarray(x))
    with torch.no_grad():
        touts = tswin(torch.from_numpy(x).permute(0, 3, 1, 2))
    for key in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(np.asarray(outs[key]), _t2j(touts[key]),
                                   atol=3e-4)


# --- predictor twin ----------------------------------------------------------
class TPredictor(nn.Module):
    """MultiScaleMaskedTransformerDecoder key layout (3 layers for speed)."""

    def __init__(self, C=32, queries=5, classes=7, layers=3, heads=4):
        super().__init__()
        self.C, self.Q, self.heads, self.L = C, queries, heads, layers
        self.query_feat = nn.Embedding(queries, C)
        self.query_embed = nn.Embedding(queries, C)
        self.level_embed = nn.Embedding(3, C)
        self.transformer_cross_attention_layers = nn.ModuleList()
        self.transformer_self_attention_layers = nn.ModuleList()
        self.transformer_ffn_layers = nn.ModuleList()
        for _ in range(layers):
            ca = nn.Module()
            ca.multihead_attn = nn.MultiheadAttention(C, heads, batch_first=True)
            ca.norm = nn.LayerNorm(C)
            self.transformer_cross_attention_layers.append(ca)
            sa = nn.Module()
            sa.self_attn = nn.MultiheadAttention(C, heads, batch_first=True)
            sa.norm = nn.LayerNorm(C)
            self.transformer_self_attention_layers.append(sa)
            ff = nn.Module()
            ff.linear1 = nn.Linear(C, 2048)
            ff.linear2 = nn.Linear(2048, C)
            ff.norm = nn.LayerNorm(C)
            self.transformer_ffn_layers.append(ff)
        self.decoder_norm = nn.LayerNorm(C)
        self.class_embed = nn.Linear(C, classes + 1)
        me = nn.Module()
        me.layers = nn.ModuleList(
            [nn.Linear(C, C), nn.Linear(C, C), nn.Linear(C, C)])
        self.mask_embed = me

    def predict(self, out, mask_features, size):
        dec = self.decoder_norm(out)
        logits = self.class_embed(dec)
        me = dec
        for i, l in enumerate(self.mask_embed.layers):
            me = l(me) if i == 2 else F.relu(l(me))
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        m = F.interpolate(masks, size=size, mode="bilinear",
                          align_corners=False)
        attn = (m.sigmoid().flatten(2) < 0.5)
        allm = attn.sum(-1, keepdim=True) == attn.shape[-1]
        attn = attn & ~allm
        return logits, masks, attn

    def forward(self, multi_scale, mask_features, pos_embeds):
        B = mask_features.shape[0]
        srcs, shapes = [], []
        for i, f in enumerate(multi_scale):
            _, C, h, w = f.shape
            srcs.append(f.flatten(2).transpose(1, 2)
                        + self.level_embed.weight[i][None, None])
            shapes.append((h, w))
        out = self.query_feat.weight[None].expand(B, -1, -1)
        qpos = self.query_embed.weight[None].expand(B, -1, -1)
        logits, masks, attn = self.predict(out, mask_features, shapes[0])
        for l in range(self.L):
            lvl = l % 3
            # expand bool mask to (B*heads, Q, N) like the reference
            am = attn.repeat_interleave(self.heads, 0)
            y, _ = self.transformer_cross_attention_layers[l].multihead_attn(
                out + qpos, srcs[lvl] + pos_embeds[lvl], srcs[lvl],
                attn_mask=torch.where(am, -1e4, 0.0))
            out = self.transformer_cross_attention_layers[l].norm(out + y)
            y, _ = self.transformer_self_attention_layers[l].self_attn(
                out + qpos, out + qpos, out)
            out = self.transformer_self_attention_layers[l].norm(out + y)
            ff = self.transformer_ffn_layers[l]
            y = ff.linear2(F.relu(ff.linear1(out)))
            out = ff.norm(out + y)
            logits, masks, attn = self.predict(out, mask_features,
                                               shapes[(l + 1) % 3])
        return logits, masks


def test_predictor_forward_parity():
    torch.manual_seed(2)
    tp = TPredictor().eval()
    with torch.no_grad():
        tp.query_feat.weight.normal_(0, 0.5)
        tp.query_embed.weight.normal_(0, 0.5)
        tp.level_embed.weight.normal_(0, 0.5)
    sd = {"p." + k: v.numpy() for k, v in tp.state_dict().items()}
    params = convert_predictor(sd, prefix="p.", num_layers=3)

    rng = np.random.RandomState(3)
    C = 32
    shapes = [(2, 3), (4, 6), (8, 12)]
    ms = [rng.normal(0, 1, (1, h, w, C)).astype(np.float32) for h, w in shapes]
    mf = rng.normal(0, 1, (1, 8, 12, C)).astype(np.float32)

    jdec = MaskedTransformerDecoder(num_classes=7, hidden_dim=C,
                                    num_queries=5, num_layers=3, num_heads=4,
                                    mask_dim=C)
    logits, masks = jdec.apply({"params": params},
                               [jnp.asarray(m) for m in ms], jnp.asarray(mf))

    from mal_tpu.segment.pixel_decoder import position_embedding_sine
    pos = [torch.from_numpy(np.asarray(
        position_embedding_sine(h, w, C)))[None] for h, w in shapes]
    with torch.no_grad():
        tl, tm = tp([torch.from_numpy(m).permute(0, 3, 1, 2) for m in ms],
                    torch.from_numpy(mf).permute(0, 3, 1, 2), pos)
    np.testing.assert_allclose(np.asarray(logits), tl.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(masks), tm.numpy(), atol=3e-3)


# --- full checkpoint structure ------------------------------------------------
class TPixelDecoderSD(nn.Module):
    """Key-layout-only twin of MSDeformAttnPixelDecoder (params, no forward)."""

    def __init__(self, chans=(96, 192, 384, 768), C=256, layers=6):
        super().__init__()
        self.input_proj = nn.ModuleList([
            nn.Sequential(nn.Conv2d(c, C, 1), nn.GroupNorm(32, C))
            for c in chans[:0:-1]])  # res5, res4, res3
        tr = nn.Module()
        tr.level_embed = nn.Parameter(torch.zeros(3, C))
        enc = nn.Module()
        mods = []
        for _ in range(layers):
            m = nn.Module()
            sa = nn.Module()
            sa.sampling_offsets = nn.Linear(C, 8 * 3 * 4 * 2)
            sa.attention_weights = nn.Linear(C, 8 * 3 * 4)
            sa.value_proj = nn.Linear(C, C)
            sa.output_proj = nn.Linear(C, C)
            m.self_attn = sa
            m.norm1 = nn.LayerNorm(C)
            m.linear1 = nn.Linear(C, 1024)
            m.linear2 = nn.Linear(1024, C)
            m.norm2 = nn.LayerNorm(C)
            mods.append(m)
        enc.layers = nn.ModuleList(mods)
        tr.encoder = enc
        self.transformer = tr
        self.adapter_1 = nn.Conv2d(chans[0], C, 1, bias=False)
        self.adapter_1.norm = nn.GroupNorm(32, C)
        self.layer_1 = nn.Conv2d(C, C, 3, padding=1, bias=False)
        self.layer_1.norm = nn.GroupNorm(32, C)
        self.mask_features = nn.Conv2d(C, C, 1)


@pytest.mark.slow
def test_full_pkl_conversion_structure(tmp_path):
    """Synthetic full checkpoint in .pkl format -> variables matching
    `Mask2Former.init` exactly (tiny Swin for speed; the key layout is
    identical across sizes)."""
    torch.manual_seed(4)
    full = nn.Module()
    full.backbone = TSwin()
    head = nn.Module()
    head.pixel_decoder = TPixelDecoderSD()
    head.predictor = TPredictor(C=256, queries=100, classes=80, layers=9,
                                heads=8)
    full.sem_seg_head = head

    sd = {k: v.detach().numpy() for k, v in full.state_dict().items()
          if "relative_position_index" not in k}
    path = tmp_path / "model_final.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd, "__author__": "test"}, f)

    variables = convert_mask2former_state(load_pkl(str(path)), size="tiny")

    model = Mask2Former(swin_size="tiny")
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    ref_p = jax.tree.map(lambda x: x.shape, ref["params"])
    got_p = jax.tree.map(lambda x: np.asarray(x).shape, variables["params"])
    assert ref_p == got_p, "params structure/shape mismatch"
