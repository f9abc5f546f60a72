"""On-chip A/B of the MSDeformAttn sampling core: XLA per-level gathers vs
the gather-free Pallas one-hot-matmul sampler (ops/pallas/deform_sample.py).

Shapes = the Swin-L pixel decoder at MAL's 192x640 working resolution:
levels (24,80)/(12,40)/(6,20), d_model 256 (8 heads x 32), P=4, Lq=2520,
batch 12 (one temporal-hint segmenter forward).

Usage: python benchmarks/bench_msdeform.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from mal_tpu.segment.msdeform import (ms_deform_attn_core_pallas,
                                      ms_deform_attn_core_per_level)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    B, H_, C, L, P = 12, 8, 32, 3, 4
    shapes = [(24, 80), (12, 40), (6, 20)]
    S = sum(h * w for h, w in shapes)
    Lq = S  # encoder self-attention: queries == all tokens

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H_, C).astype(np.float32))
    locs = jnp.asarray(rng.uniform(
        0.0, 1.0, (B, Lq, H_, L, P, 2)).astype(np.float32))
    attn = jax.nn.softmax(jnp.asarray(
        rng.randn(B, Lq, H_, L * P).astype(np.float32))).reshape(
        B, Lq, H_, L, P)

    f_ref = jax.jit(lambda v, l, a: ms_deform_attn_core_per_level(
        v, shapes, l, a))
    f_pal = jax.jit(lambda v, l, a: ms_deform_attn_core_pallas(
        v, shapes, l, a))
    f_bf16 = jax.jit(lambda v, l, a: ms_deform_attn_core_pallas(
        v, shapes, l, a, mxu_precision="bf16"))

    r = f_ref(value, locs, attn)
    p = f_pal(value, locs, attn)
    pb = f_bf16(value, locs, attn)
    err = float(jnp.abs(r - p).max())
    err_b = float(jnp.abs(r - pb).max())
    print(f"max_abs_err={err:.3e}  bf16_max_abs_err={err_b:.3e}")
    # Gate the COMPILED kernel's cross-grid-step accumulation + bf16x3 path
    # (CI only exercises interpret mode — ADVICE r4): values ~N(0,1), so
    # these bounds catch wrong-accumulation bugs, not just noise.
    assert err < 1e-4, f"compiled Pallas sampler diverged: {err:.3e}"
    assert err_b < 2e-2, f"compiled bf16x3 sampler diverged: {err_b:.3e}"
    print("PARITY_OK")

    t_ref = timeit(f_ref, value, locs, attn)
    t_pal = timeit(f_pal, value, locs, attn)
    t_b = timeit(f_bf16, value, locs, attn)
    print(f"xla_gather_ms={t_ref:.2f}  pallas_ms={t_pal:.2f}  "
          f"pallas_bf16_ms={t_b:.2f}  speedup={t_ref / t_pal:.2f}x  "
          f"bf16_speedup={t_ref / t_b:.2f}x")


if __name__ == "__main__":
    main()
