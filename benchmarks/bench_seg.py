"""Segmenter (temporal hint) component timings on the real chip.

Times the Swin-L backbone and the full Mask2Former forward at MAL's working
resolution (192x640, batch 12) under different `jax.default_matmul_precision`
settings, and reports the numeric deviation of the relaxed-precision
variants vs the production default.

Usage: python benchmarks/bench_seg.py
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

from mal_tpu.segment.mask2former import Mask2Former
from mal_tpu.segment.swin import SwinTransformer

B, H, W = 12, 192, 640


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (B, H, W, 3), jnp.float32)

    bb = SwinTransformer("large")
    bb_vars = jax.jit(bb.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1, H, W, 3)))
    model = Mask2Former()
    m_vars = jax.jit(model.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, H, W, 3)))

    def run(name, prec):
        def bb_fn(v, x):
            with jax.default_matmul_precision(prec) if prec else _null():
                return bb.apply(v, x)

        def m_fn(v, x):
            with jax.default_matmul_precision(prec) if prec else _null():
                return model.apply(v, x)

        t_bb = timeit(jax.jit(bb_fn), bb_vars, imgs)
        t_m = timeit(jax.jit(m_fn), m_vars, imgs)
        logits, masks = jax.jit(m_fn)(m_vars, imgs)
        print(f"{name}: backbone={t_bb:.1f} ms  full={t_m:.1f} ms", flush=True)
        return logits, masks

    import contextlib

    def _null():
        return contextlib.nullcontext()

    ref_logits, ref_masks = run("default", None)
    for prec in ["tensorfloat32", "bfloat16"]:
        lg, mk = run(prec, prec)
        dl = float(jnp.abs(lg - ref_logits).max())
        dm = float(jnp.abs(mk - ref_masks).max())
        print(f"  {prec}: max|dlogits|={dl:.3e} max|dmask|={dm:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
