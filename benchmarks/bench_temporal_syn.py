"""Temporal-hint synthesis + matcher cost at production shapes.

The round-5 full-bench arithmetic leaves ~20 ms/step of temporal cost
outside the 3 segmenter forwards (12/25.27 s - base 237 ms - 3x70.9 ms);
this times the pieces standalone: instance matching (JV assignment over
full-res dice costs) and image_synthesis (N=16 per-instance dynamic
rolls), forward and with gradients, at 192x640 B12.

Usage: python benchmarks/bench_temporal_syn.py
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

from mal_tpu.segment.instances import Instances
from mal_tpu.segment.matcher import match_instances
from mal_tpu.temporal import image_synthesis


def timeit(fn, *args, iters=10):
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


def make_instances(rng, B, N, H, W, n_real):
    masks = np.zeros((B, N, H, W), np.float32)
    for b in range(B):
        for i in range(n_real):
            y0 = (17 * i + 11 * b) % (H - 40)
            x0 = (53 * i + 29 * b) % (W - 80)
            masks[b, i, y0:y0 + 36, x0:x0 + 72] = 1.0
    scores = np.zeros((B, N), np.float32)
    scores[:, :n_real] = 0.95
    classes = np.zeros((B, N), np.int32)
    valid = scores > 0.5
    return Instances(masks=jnp.asarray(masks),
                     classes=jnp.asarray(classes),
                     scores=jnp.asarray(scores),
                     valid=jnp.asarray(valid))


def main():
    B, H, W = 12, 192, 640
    rng = np.random.RandomState(0)
    for N, n_real in ((8, 6), (16, 12)):
        cur = make_instances(rng, B, N, H, W, n_real)
        last = make_instances(rng, B, N, H, W, n_real)
        nxt = make_instances(rng, B, N, H, W, n_real)
        w_last = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
        w_next = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))

        f_match = jax.jit(lambda a, b, c: match_instances(a, b, c))
        t_match = timeit(f_match, last, nxt, cur)

        f_syn = jax.jit(lambda wl, wn, c, l, n: image_synthesis(
            wl, wn, c, l, n, payload_dtype=jnp.bfloat16))
        t_syn = timeit(f_syn, w_last, w_next, cur, last, nxt)

        def syn_grad(wl, wn, c, l, n):
            return jax.grad(lambda a, b: jnp.sum(image_synthesis(
                a, b, c, l, n, payload_dtype=jnp.bfloat16)[0]
                + image_synthesis(a, b, c, l, n,
                                  payload_dtype=jnp.bfloat16)[1]))(wl, wn)

        f_syn_g = jax.jit(syn_grad)
        t_syn_g = timeit(f_syn_g, w_last, w_next, cur, last, nxt)

        print(f"N={N:2d} ({n_real} real): match {t_match:6.2f} ms   "
              f"synthesis fwd {t_syn:6.2f} ms   "
              f"synthesis fwd+bwd {t_syn_g:6.2f} ms")


if __name__ == "__main__":
    main()
