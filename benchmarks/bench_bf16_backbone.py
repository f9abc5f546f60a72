"""A/B the `Mask2Former(bf16_backbone=...)` knob on the real chip.

Times the full seg_fn (Mask2Former forward + instance inference) at MAL's
temporal-hint working shape (192x640, batch 12) with the Swin matmuls in
fp32 vs bfloat16 (fp32 accumulation), and reports the deviation of the
instance outputs. Informs whether bf16_backbone should be the temporal
fast-mode default (NEXT.md item 9).

Usage: python benchmarks/bench_bf16_backbone.py
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

from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn

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
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3),
                              jnp.float32)
    # identical weights for both variants (bf16_backbone only changes
    # compute dtype, not the param pytree)
    ref = Mask2Former(bf16_backbone=False)
    variables = jax.jit(ref.init)(jax.random.PRNGKey(1),
                                  jnp.zeros((1, H, W, 3)))

    results = {}
    for bf16 in (False, True):
        model = Mask2Former(bf16_backbone=bf16)
        seg_fn = jax.jit(make_seg_fn(model, None, 8))
        t = timeit(seg_fn, variables, imgs, iters=5)
        inst = seg_fn(variables, imgs)
        results[bf16] = (t, inst)
        print(f"bf16_backbone={bf16}: seg_fn {t:.1f} ms "
              f"({B / t * 1000:.1f} img/s)", flush=True)

    (t0_, i0), (t1_, i1) = results[False], results[True]
    dm = float(jnp.abs(i0.masks.astype(jnp.float32)
                       - i1.masks.astype(jnp.float32)).mean())
    ds = float(jnp.abs(i0.scores - i1.scores).max())
    print(f"speedup {t0_ / t1_:.2f}x  mask-bit flip rate {dm:.3e}  "
          f"max|dscore| {ds:.3e}")


if __name__ == "__main__":
    main()
