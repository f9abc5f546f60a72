"""Per-stage Swin-L backbone decomposition (fused blocks, bf16 fast mode).

Composed-prefix timing (the only valid methodology over the axon tunnel —
see PROFILE.md "Measurement methodology"): each prefix = patch embed +
stages 0..k inside ONE jit; stage cost = prefix diff. Steers which backbone
piece gets the next fusion treatment now that the pixel decoder is cheap
(PROFILE.md round-4 section).

Usage: python benchmarks/bench_swin_stages.py
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

import flax.linen as nn
import jax.numpy as jnp

from mal_tpu.segment.swin import SwinTransformer

B, H, W = 12, 192, 640


class _Prefix(nn.Module):
    """Patch embed + first `upto` stages of SwinTransformer, sharing its
    parameter tree (module names match, so full-backbone variables load)."""
    upto: int

    @nn.compact
    def __call__(self, x):
        full = SwinTransformer("large", fused_block=True, bf16_compute=True,
                               name="bb")
        return full(x, max_stage=self.upto)


def timeit(fn, *args, iters=10):
    """min-of-3 rounds: the tunnel's first post-compile round carries a
    large warm-up tail (~90 ms/call measured on a trivial program) and the
    steady-state dispatch floor is ~1.5-2 ms/call — small-prefix absolute
    numbers are only comparable at the round minimum."""
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def main():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3),
                              jnp.float32)
    ref = SwinTransformer("large", name="bb")
    variables = jax.jit(
        lambda: _Prefix(upto=4).init(jax.random.PRNGKey(1),
                                     jnp.zeros((1, H, W, 3))))()

    prev = 0.0
    for k in range(5):
        f = jax.jit(lambda v, im, k=k: _Prefix(upto=k).apply(v, im))
        t = timeit(f, variables, imgs)
        label = "patch embed" if k == 0 else f"+stage{k - 1}"
        print(f"{label:14s}: {t:7.1f} ms  (delta {t - prev:+6.1f})")
        prev = t


if __name__ == "__main__":
    main()
