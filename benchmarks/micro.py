"""Micro-benchmarks of the loss-pipeline ops at the headline shape.

Pins down where the ~96 ms loss-forward (benchmarks/ablate.py loss_fwd -
forward_only) actually goes: warp gathers vs SSIM pools vs coordinate math.

Usage: python benchmarks/micro.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

B, H, W = 12, 192, 640


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    from mal_tpu import geometry
    from mal_tpu.ops.interp import grid_sample
    from mal_tpu.ops.ssim import ssim
    from mal_tpu import losses

    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (B, H, W, 3), jnp.float32)
    img2 = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))
    depth = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 1)) * 10 + 1
    T = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).at[:, 0, 3].set(0.1)
    K = jnp.tile(jnp.eye(4)[None], (B, 1, 1))
    K = K.at[:, 0, 0].set(0.58 * W).at[:, 1, 1].set(1.92 * H) \
        .at[:, 0, 2].set(0.5 * W).at[:, 1, 2].set(0.5 * H)
    invK = jnp.linalg.inv(K)

    points = geometry.backproject(depth[..., 0], invK, H, W)
    grid = geometry.project_3d(points, K, T, H, W)

    bench = {
        "backproject+project": jax.jit(
            lambda d: geometry.project_3d(
                geometry.backproject(d[..., 0], invK, H, W), K, T, H, W)),
        "warp_fp32": jax.jit(
            lambda g: grid_sample(img, g, "border", True)),
        "warp_bf16": jax.jit(
            lambda g: grid_sample(img.astype(jnp.bfloat16), g, "border",
                                  True)),
        "ssim": jax.jit(lambda a, b: ssim(a, b)),
        "reproj_loss": jax.jit(
            lambda a, b: losses.reprojection_loss(a, b)),
        "smooth_loss": jax.jit(
            lambda d, i: losses.smooth_loss(d, i)),
    }
    args = {
        "backproject+project": (depth,),
        "warp_fp32": (grid,),
        "warp_bf16": (grid,),
        "ssim": (img, img2),
        "reproj_loss": (img, img2),
        "smooth_loss": (depth, img),
    }
    want = sys.argv[1:] or list(bench)
    for name in want:
        ms = timeit(bench[name], *args[name])
        print(f"{name:22s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
