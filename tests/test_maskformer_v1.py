"""MaskFormer-v1 family (`mal_tpu/segment/maskformer_v1.py`).

Torch-twin parity for the FPN pixel decoder and the DETR decoder layer
(the two numerically risky pieces: GN/conv semantics and post-norm MHA
ordering), mirroring `mask2former/modeling/pixel_decoder/fpn.py:137-156`
and `transformer_decoder/transformer.py` (TransformerDecoderLayer,
normalize_before=False); plus end-to-end shape/jit/compose smoke tests.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mal_tpu.segment.maskformer_v1 import (DecoderLayer, FPNPixelDecoder,
                                           MaskFormerV1, PerPixelBaselineHead,
                                           StandardTransformerDecoder)


def _conv_j2t(kernel):  # flax (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    return torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1))


def _feats(rng, B=2, C0=8):
    feats = {}
    for i, f in enumerate(["res2", "res3", "res4", "res5"]):
        h, w = 32 >> i, 48 >> i
        feats[f] = rng.normal(size=(B, h, w, C0 * (2 ** i))) \
            .astype(np.float32)
    return feats


class _TorchFPN(torch.nn.Module):
    """fpn.py:137-156 forward_features with GN norm, torch layout."""

    def __init__(self, chans, conv_dim, mask_dim):
        super().__init__()
        self.lateral = torch.nn.ModuleList(
            [torch.nn.Conv2d(c, conv_dim, 1, bias=False) for c in chans[:-1]])
        self.lateral_n = torch.nn.ModuleList(
            [torch.nn.GroupNorm(32, conv_dim) for _ in chans[:-1]])
        self.output = torch.nn.ModuleList(
            [torch.nn.Conv2d(conv_dim if i < len(chans) - 1 else chans[-1],
                             conv_dim, 3, padding=1, bias=False)
             for i in range(len(chans))])
        self.output_n = torch.nn.ModuleList(
            [torch.nn.GroupNorm(32, conv_dim) for _ in chans])
        self.mask_features = torch.nn.Conv2d(conv_dim, mask_dim, 3, padding=1)

    def forward(self, feats):  # dict of NCHW, res2..res5
        names = ["res2", "res3", "res4", "res5"]
        multi = []
        for idx, f in enumerate(reversed(names)):
            x = feats[f]
            i = len(names) - 1 - idx
            if idx == 0:
                y = torch.relu(self.output_n[i](self.output[i](x)))
            else:
                lat = self.lateral_n[i](self.lateral[i](x))
                y = lat + torch.nn.functional.interpolate(
                    y, size=lat.shape[-2:], mode="nearest")
                y = torch.relu(self.output_n[i](self.output[i](y)))
            if len(multi) < 3:
                multi.append(y)
        return self.mask_features(y), multi


def test_fpn_pixel_decoder_torch_parity():
    rng = np.random.default_rng(0)
    feats = _feats(rng)
    model = FPNPixelDecoder(conv_dim=64, mask_dim=32)
    variables = model.init(jax.random.PRNGKey(0),
                           jax.tree.map(jnp.asarray, feats))
    p = variables["params"]

    chans = [feats[f].shape[-1] for f in ["res2", "res3", "res4", "res5"]]
    twin = _TorchFPN(chans, 64, 32)
    with torch.no_grad():
        for i, f in enumerate(["res2", "res3", "res4"]):
            twin.lateral[i].weight.copy_(_conv_j2t(p[f"adapter_{f}"]["kernel"]))
            twin.lateral_n[i].weight.copy_(torch.from_numpy(
                np.asarray(p[f"adapter_{f}_norm"]["scale"])))
            twin.lateral_n[i].bias.copy_(torch.from_numpy(
                np.asarray(p[f"adapter_{f}_norm"]["bias"])))
            twin.output[i].weight.copy_(_conv_j2t(p[f"layer_{f}"]["kernel"]))
            twin.output_n[i].weight.copy_(torch.from_numpy(
                np.asarray(p[f"layer_{f}_norm"]["scale"])))
            twin.output_n[i].bias.copy_(torch.from_numpy(
                np.asarray(p[f"layer_{f}_norm"]["bias"])))
        twin.output[3].weight.copy_(_conv_j2t(p["layer_coarse"]["kernel"]))
        twin.output_n[3].weight.copy_(torch.from_numpy(
            np.asarray(p["layer_coarse_norm"]["scale"])))
        twin.output_n[3].bias.copy_(torch.from_numpy(
            np.asarray(p["layer_coarse_norm"]["bias"])))
        twin.mask_features.weight.copy_(
            _conv_j2t(p["mask_features"]["kernel"]))
        twin.mask_features.bias.copy_(torch.from_numpy(
            np.asarray(p["mask_features"]["bias"])))

        tfeats = {k: torch.from_numpy(v).permute(0, 3, 1, 2)
                  for k, v in feats.items()}
        t_mask, t_multi = twin(tfeats)

    j_mask, j_tf, j_multi = model.apply(variables,
                                        jax.tree.map(jnp.asarray, feats))
    assert j_tf is None
    np.testing.assert_allclose(
        np.asarray(j_mask), t_mask.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)
    assert len(j_multi) == 3
    for jm, tm in zip(j_multi, t_multi):
        np.testing.assert_allclose(
            np.asarray(jm), tm.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)


def test_decoder_layer_torch_parity():
    """DETR post-norm decoder layer vs torch nn.MultiheadAttention +
    explicit residual/norm ordering (transformer.py, normalize_before=False,
    dropout off)."""
    C, heads, B, Q, N = 32, 4, 2, 5, 18
    rng = np.random.default_rng(1)
    tgt = rng.normal(size=(B, Q, C)).astype(np.float32)
    mem = rng.normal(size=(B, N, C)).astype(np.float32)
    qpos = rng.normal(size=(B, Q, C)).astype(np.float32)
    pos = rng.normal(size=(B, N, C)).astype(np.float32)

    layer = DecoderLayer(C, heads)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(tgt),
                           jnp.asarray(mem), jnp.asarray(qpos),
                           jnp.asarray(pos))
    p = variables["params"]

    def mha(pj):
        m = torch.nn.MultiheadAttention(C, heads, batch_first=True)
        with torch.no_grad():
            w = np.concatenate([np.asarray(pj[k]["kernel"]).T
                                for k in ("q", "k", "v")])
            b = np.concatenate([np.asarray(pj[k]["bias"])
                                for k in ("q", "k", "v")])
            m.in_proj_weight.copy_(torch.from_numpy(w))
            m.in_proj_bias.copy_(torch.from_numpy(b))
            m.out_proj.weight.copy_(
                torch.from_numpy(np.asarray(pj["out"]["kernel"]).T))
            m.out_proj.bias.copy_(
                torch.from_numpy(np.asarray(pj["out"]["bias"])))
        return m

    def ln(pj):
        m = torch.nn.LayerNorm(C)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(np.asarray(pj["scale"])))
            m.bias.copy_(torch.from_numpy(np.asarray(pj["bias"])))
        return m

    def lin(pj, dout):
        m = torch.nn.Linear(pj["kernel"].shape[0], dout)
        with torch.no_grad():
            m.weight.copy_(torch.from_numpy(np.asarray(pj["kernel"]).T))
            m.bias.copy_(torch.from_numpy(np.asarray(pj["bias"])))
        return m

    sa, ca = mha(p["self_attn"]), mha(p["cross_attn"])
    n1, n2, n3 = ln(p["norm1"]), ln(p["norm2"]), ln(p["norm3"])
    l1 = lin(p["linear1"], p["linear1"]["kernel"].shape[1])
    l2 = lin(p["linear2"], C)

    with torch.no_grad():
        t_tgt = torch.from_numpy(tgt)
        t_mem = torch.from_numpy(mem)
        t_qp = torch.from_numpy(qpos)
        t_p = torch.from_numpy(pos)
        q = t_tgt + t_qp
        y, _ = sa(q, q, t_tgt)
        t = n1(t_tgt + y)
        y, _ = ca(t + t_qp, t_mem + t_p, t_mem)
        t = n2(t + y)
        t = n3(t + l2(torch.relu(l1(t))))

    got = layer.apply(variables, jnp.asarray(tgt), jnp.asarray(mem),
                      jnp.asarray(qpos), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), t.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_standard_decoder_shapes_and_aux():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 32)).astype(np.float32))
    mf = jnp.asarray(rng.normal(size=(2, 16, 24, 16)).astype(np.float32))
    model = StandardTransformerDecoder(num_classes=7, hidden_dim=32,
                                       num_queries=5, dec_layers=3, heads=4,
                                       mask_dim=16, return_aux=True)
    variables = model.init(jax.random.PRNGKey(0), x, mf)
    logits, masks = model.apply(variables, x, mf)
    assert logits.shape == (3, 2, 5, 8) and masks.shape == (3, 2, 5, 16, 24)
    # final layer of the aux stack == non-aux output
    m2 = StandardTransformerDecoder(num_classes=7, hidden_dim=32,
                                    num_queries=5, dec_layers=3, heads=4,
                                    mask_dim=16, return_aux=False)
    l2_, k2 = m2.apply(variables, x, mf)
    np.testing.assert_allclose(np.asarray(logits[-1]), np.asarray(l2_),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(masks[-1]), np.asarray(k2),
                               rtol=1e-6, atol=1e-6)


def test_maskformer_v1_end_to_end():
    """Tiny MaskFormerV1 composes with the shared inference modes."""
    from mal_tpu.segment.inference import semantic_inference
    from mal_tpu.segment.mask2former import instance_inference

    model = MaskFormerV1(num_classes=7, swin_size="tiny", num_queries=5)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3)))
    logits, masks = jax.jit(model.apply)(variables, img)
    assert logits.shape == (1, 5, 8)
    assert masks.shape == (1, 5, 16, 24)
    sem = semantic_inference(logits, masks)
    assert sem.shape == (1, 7, 16, 24)
    inst = instance_inference(logits, masks, 64, 96, max_instances=4)
    assert inst.masks.shape == (1, 4, 64, 96)
    assert np.isfinite(np.asarray(logits)).all()


def test_per_pixel_baseline_loss_matches_torch_ce():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 8, 12, 5)).astype(np.float32)
    targets = rng.integers(-1, 5, size=(2, 8, 12))
    got = PerPixelBaselineHead.loss(jnp.asarray(logits),
                                    jnp.asarray(targets), ignore_value=-1,
                                    loss_weight=2.0)
    want = 2.0 * torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(targets).long(), ignore_index=-1).item()
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_per_pixel_baseline_forward():
    rng = np.random.default_rng(4)
    feats = _feats(rng, B=1)
    head = PerPixelBaselineHead(num_classes=5)
    variables = head.init(jax.random.PRNGKey(0),
                          jax.tree.map(jnp.asarray, feats))
    out = head.apply(variables, jax.tree.map(jnp.asarray, feats))
    assert out.shape == (1, 128, 192, 5)  # res2 (32x48) x common_stride 4
