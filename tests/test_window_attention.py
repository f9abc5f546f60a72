"""Fused window-attention kernel vs the XLA reference path (the
MSDeformAttn `test.py` equivalence pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.ops.pallas.window_attention import (window_attention_fused,
                                                 window_attention_reference)


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_fused_matches_reference_unmasked():
    nW, h, N, d = 6, 4, 144, 32
    q, k, v = (_rand((nW, h, N, d), i) for i in range(3))
    bias = _rand((1, h, N, N), 3) * 0.1
    ref = window_attention_reference(q, k, v, jnp.broadcast_to(
        bias, (nW, h, N, N)))
    got = window_attention_fused(q, k, v, bias, num_wins_per_image=1,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_reference_masked():
    """Per-window masks select via w % nm like the shifted-window layout."""
    nm, imgs, h, N, d = 4, 3, 2, 144, 32
    nW = nm * imgs
    q, k, v = (_rand((nW, h, N, d), i) for i in range(3))
    rpb = _rand((1, h, N, N), 3) * 0.1
    mask = jnp.where(_rand((nm, N, N), 4) > 0, 0.0, -100.0)
    bias_all = rpb + mask[:, None]

    full_bias = jnp.concatenate([bias_all] * imgs, axis=0)
    ref = window_attention_reference(q, k, v, full_bias)
    got = window_attention_fused(q, k, v, bias_all, num_wins_per_image=nm,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_swin_module_fused_equals_xla_path():
    """WindowAttention(use_fused interpret) == use_fused=False, same params."""
    from mal_tpu.segment.swin import WindowAttention

    nW, N, C, hds = 8, 144, 96, 3
    x = _rand((nW, N, C), 0)
    mask = jnp.where(_rand((4, N, N), 1) > 0, 0.0, -100.0)

    ref_mod = WindowAttention(C, hds, 12, use_fused=False)
    variables = ref_mod.init(jax.random.PRNGKey(2), x, mask)
    ref = ref_mod.apply(variables, x, mask)

    import mal_tpu.ops.pallas.window_attention as wa

    orig = wa.window_attention_fused

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    wa.window_attention_fused = interp
    try:
        fused_mod = WindowAttention(C, hds, 12, use_fused=True)
        got = fused_mod.apply(variables, x, mask)
    finally:
        wa.window_attention_fused = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
