"""A/B the fused Swin block kernels on the real chip.

Times the Swin-L backbone forward and the full seg_fn at MAL's
temporal-hint working shape (192x640, batch 12) with `fused_swin`
off/on, at the production bf16 compute dtype, and reports output
deviation (same weights). Informs whether `fused_swin` becomes the
frozen-segmenter default (ops/pallas/swin_block.py).

Usage: python benchmarks/bench_swin_fused.py
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

from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn
from mal_tpu.segment.swin import SwinTransformer

B, H, W = 12, 192, 640


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3),
                              jnp.float32)

    # --- backbone alone ---
    ref = SwinTransformer("large")
    bvars = jax.jit(ref.init)(jax.random.PRNGKey(1),
                              jnp.zeros((1, H, W, 3)))
    outs = {}
    for label, kw in (
            ("fp32", {}),
            ("fp32+fused", dict(fused_block=True)),
            ("bf16", dict(bf16_compute=True)),
            ("bf16+fused", dict(bf16_compute=True, fused_block=True))):
        bb = SwinTransformer("large", **kw)
        f = jax.jit(lambda v, x, m=bb: m.apply(v, x))
        t = timeit(f, bvars, imgs)
        outs[label] = (t, f(bvars, imgs))
        print(f"backbone {label:12s}: {t:7.1f} ms")
    base = outs["fp32"][1]
    for label in ("fp32+fused", "bf16", "bf16+fused"):
        dev = max(float(jnp.max(jnp.abs(outs[label][1][k] - base[k])))
                  for k in base)
        print(f"  max |{label} - fp32| over stage outputs: {dev:.2e}")

    # --- full seg_fn ---
    m0 = Mask2Former(bf16_backbone=True)
    variables = jax.jit(m0.init)(jax.random.PRNGKey(2),
                                 jnp.zeros((1, H, W, 3)))
    for label, kw in (("bf16", dict(bf16_backbone=True)),
                      ("bf16+fused", dict(bf16_backbone=True,
                                          fused_swin=True))):
        model = Mask2Former(**kw)
        seg_fn = jax.jit(make_seg_fn(model, None, 8))
        t = timeit(seg_fn, variables, imgs)
        inst = seg_fn(variables, imgs)
        print(f"seg_fn {label:12s}: {t:7.1f} ms  "
              f"(temporal_fps ~ {B / ((239 + 3 * t) / 1000):.2f} online)")
        if label == "bf16":
            inst_base = inst
        else:
            flip = float(jnp.mean(inst.masks != inst_base.masks))
            ds = float(jnp.max(jnp.abs(inst.scores - inst_base.scores)))
            print(f"  mask bit flips vs bf16: {flip:.2%}, "
                  f"max score delta {ds:.2e}")


if __name__ == "__main__":
    main()
