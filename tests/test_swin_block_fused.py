"""Fused Swin block kernels (`ops/pallas/swin_block.py`) vs the XLA path.

The fused path must be numerically equivalent (fp32) to the unfused
flax modules for every structural case: exact window fit, padding to
window multiples, and shifted windows with the attention mask — and must
create an IDENTICAL parameter tree so checkpoints are interchangeable.

Runs in Pallas interpret mode on the CPU backend (SwinBlock auto-selects
interpret off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.segment.swin import SwinBlock, SwinTransformer


def _block_pair(dim=16, heads=4, ws=4):
    fused = SwinBlock(dim, heads, ws, fused_block=True)
    ref = SwinBlock(dim, heads, ws, fused_block=False)
    return fused, ref


def _init(mod, x, flag):
    return mod.init(jax.random.PRNGKey(0), x, flag)


@pytest.mark.parametrize("H,W,flag", [
    (8, 12, 0.0),          # exact fit, W-MSA
    (8, 12, 1.0),          # exact fit, shifted
    (7, 10, 0.0),          # padded, W-MSA
    (7, 10, 1.0),          # padded + shifted
])
def test_fused_block_matches_unfused(H, W, flag):
    fused, ref = _block_pair()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 16))
    params = _init(ref, x, jnp.asarray(flag))
    out_ref = ref.apply(params, x, jnp.asarray(flag))
    out_fused = fused.apply(params, x, jnp.asarray(flag))
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-4, atol=2e-5)


def test_param_tree_identical():
    """fused_block=True creates the exact same parameter tree (paths,
    shapes, dtypes) as the unfused path — checkpoints interchangeable."""
    fused, ref = _block_pair()
    x = jnp.zeros((1, 8, 8, 16))
    flag = jnp.asarray(0.0)
    sf = jax.eval_shape(lambda: fused.init(jax.random.PRNGKey(0), x, flag))
    sr = jax.eval_shape(lambda: ref.init(jax.random.PRNGKey(0), x, flag))
    pf = jax.tree.map(lambda a: (a.shape, a.dtype), sf)
    pr = jax.tree.map(lambda a: (a.shape, a.dtype), sr)
    assert jax.tree_util.tree_structure(pf) == jax.tree_util.tree_structure(pr)
    assert jax.tree.leaves(pf) == jax.tree.leaves(pr)


def test_full_backbone_fused_matches_unfused():
    """Whole SwinTransformer (scan over blocks, patch merging, stage
    output norms) with fused blocks == unfused, same params."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 64, 3))
    ref = SwinTransformer("tiny")
    params = jax.jit(ref.init)(jax.random.PRNGKey(3), x)
    out_ref = ref.apply(params, x)
    out_fused = SwinTransformer("tiny", fused_block=True).apply(params, x)
    assert set(out_ref) == set(out_fused)
    for k in out_ref:
        np.testing.assert_allclose(out_fused[k], out_ref[k],
                                   rtol=5e-4, atol=5e-5)


def test_fused_block_train_falls_back():
    """fused_block is eval-only (forward-only kernels): train=True must
    take the unfused path (droppath rng consumed, grads well-defined)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 12, 16))
    flag = jnp.asarray(0.0)
    ref = SwinBlock(16, 4, 4, train=True)
    fused = SwinBlock(16, 4, 4, train=True, fused_block=True)
    params = ref.init({"params": jax.random.PRNGKey(0),
                       "droppath": jax.random.PRNGKey(5)}, x, flag,
                      jnp.asarray(0.5))
    a = ref.apply(params, x, flag, jnp.asarray(0.5),
                  rngs={"droppath": jax.random.PRNGKey(7)})
    b = fused.apply(params, x, flag, jnp.asarray(0.5),
                    rngs={"droppath": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_mask2former_fused_swin_end_to_end():
    """Full Mask2Former (pixel decoder + predictor + instance inference)
    with fused_swin=True matches the unfused model, same weights."""
    from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn

    variables = Mask2Former(swin_size="tiny").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    ref = make_seg_fn(Mask2Former(swin_size="tiny"), None, 4)(
        variables, imgs)
    fused = make_seg_fn(Mask2Former(swin_size="tiny", fused_swin=True),
                        None, 4)(variables, imgs)
    np.testing.assert_allclose(fused.scores, ref.scores, rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_array_equal(fused.classes, ref.classes)
    assert float(jnp.mean(fused.masks != ref.masks)) < 1e-3


def test_group_blocked_plans_match_unfused():
    """Stage-2-shaped block (C=768, 24 heads): the VMEM plans go
    group-blocked (G>1 head groups / hidden groups with output
    accumulation across the innermost grid dim) — must match the unfused
    path exactly like the whole-weight G=1 case does."""
    from mal_tpu.ops.pallas.swin_block import _attn_plan, _mlp_plan

    G_attn, _ = _attn_plan(1, 768, 144, 24, jnp.float32)
    G_mlp, _ = _mlp_plan(144, 768, 3072, jnp.float32)
    assert G_attn > 1 and G_mlp > 1  # the point of the test

    fused = SwinBlock(768, 24, 12, fused_block=True)
    ref = SwinBlock(768, 24, 12, fused_block=False)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 12, 768)) * 0.5
    for flag in (0.0, 1.0):  # W-MSA and (degenerate-roll) shifted
        params = _init(ref, x, jnp.asarray(flag))
        out_ref = ref.apply(params, x, jnp.asarray(flag))
        out_fused = fused.apply(params, x, jnp.asarray(flag))
        np.testing.assert_allclose(out_fused, out_ref, rtol=3e-4, atol=3e-5)


def test_bf16_stream_backbone_close_to_fp32():
    """Fast mode (fused blocks + bf16 compute) carries the residual stream
    in bf16 between fused kernels (round 5: halves the stream's HBM
    traffic; faithful to the reference's autocast eval,
    `manydepth/trainer.py:573`). Outputs must stay fp32 feature maps and
    remain within bf16 tolerance of the exact fp32 path."""
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 64, 3))
    ref = SwinTransformer("tiny")
    params = jax.jit(ref.init)(jax.random.PRNGKey(3), x)
    out_ref = ref.apply(params, x)
    out_fast = SwinTransformer("tiny", fused_block=True,
                               bf16_compute=True).apply(params, x)
    for k in out_ref:
        assert out_fast[k].dtype == jnp.float32
        err = np.max(np.abs(np.asarray(out_fast[k])
                            - np.asarray(out_ref[k])))
        scale = np.max(np.abs(np.asarray(out_ref[k]))) + 1e-6
        assert err / scale < 0.06, (k, err, scale)
