"""DynamicDepth step decomposition (VERDICT r4 weak #5).

Why the DynamicDepth step runs 2.4x slower PER FRAME than the manydepth
step (48.5 vs 19.8 ms/frame at their reference configs): times the full
step, the forward-only loss, the bare model forward, and the
occlusion-aware cost volume (`mal_tpu/dynamic/cost_volume.py`) alone at
production shapes. Every timed piece is >=10 ms so the axon dispatch floor
(~1.5-2 ms) is noise; min-of-3 rounds.

Usage: python benchmarks/bench_dynamic_decompose.py
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

from mal_tpu.config import TRAIN_FAST_SETTINGS, Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.dynamic.model import DynDepthModel
from mal_tpu.dynamic.step import make_dynamic_loss_fn, make_dynamic_train_step
from mal_tpu.train.state import create_train_state, make_optimizer


def timeit(fn, *args, iters=8):
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
    cfg = Config(height=192, width=512, batch_size=14,
                 method="dynamicdepth", cv_min=True, cv_set_1=True,
                 cv_pool_th=0.15).replace(**TRAIN_FAST_SETTINGS)
    rng = jax.random.PRNGKey(0)
    batch = dict(synthetic_batch(cfg, rng))
    B, H, W = cfg.batch_size, cfg.height, cfg.width
    doj = np.zeros((B, H, W), np.float32)
    doj[:, 60:120, 100:300] = 1.0
    batch["doj_mask"] = jnp.asarray(doj)
    batch["doj_mask-1"] = jnp.asarray(np.roll(doj, -8, axis=2))
    batch["doj_mask+1"] = jnp.asarray(np.roll(doj, 8, axis=2))

    model = DynDepthModel(cfg)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)

    # 1) full train step (grad + Adam)
    step = jax.jit(make_dynamic_train_step(cfg, model, tx))
    t_step = timeit(step, state, batch, jax.random.PRNGKey(1), jnp.zeros(()))

    # 2) forward-only loss (no grad): step - this = backward + optimizer
    loss_fn = make_dynamic_loss_fn(cfg, model)
    fwd = jax.jit(lambda p, bs, b, r: loss_fn(
        p, bs, state.bins.min_depth, state.bins.max_depth, b, r,
        jax.random.fold_in(r, 1)))
    t_fwd = timeit(fwd, state.params, state.batch_stats, batch,
                   jax.random.PRNGKey(1))

    # 3) bare model forward (no losses): fwd - this = DOMD + losses
    mdl = jax.jit(lambda p, bs, b, r: model.apply(
        {"params": p, "batch_stats": bs}, b, state.bins.min_depth,
        state.bins.max_depth, r, train=True, mutable=["batch_stats"]))
    t_mdl = timeit(mdl, state.params, state.batch_stats, batch,
                   jax.random.PRNGKey(1))

    # 4) occlusion-aware cost volume alone at production shapes
    #    (C=64 resnet18 quarter-res features, D=96, F=2 lookup frames)
    from mal_tpu.dynamic.cost_volume import occlusion_aware_cost_volume

    h, w, C, D, F = H // 4, W // 4, 64, cfg.num_depth_bins, 2
    kr = jax.random.PRNGKey(2)
    cur = jax.random.uniform(kr, (B, h, w, C), jnp.float32)
    look = jax.random.uniform(kr, (B, F, h, w, C), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4).at[0, 3].set(0.1), (B, F, 4, 4))
    K = jnp.broadcast_to(
        jnp.eye(4).at[0, 0].set(0.58 * w).at[1, 1].set(1.92 * h)
        .at[0, 2].set(w / 2).at[1, 2].set(h / 2), (B, 4, 4))
    inv_K = jnp.linalg.inv(K)
    bins = jnp.linspace(0.5, 10.0, D)
    imgs = jax.random.uniform(kr, (B, F, H, W, 3), jnp.float32)
    aug = jnp.zeros((B,))

    cv = jax.jit(lambda c, l, p, im: occlusion_aware_cost_volume(
        c, l, p, K, inv_K, bins, im, aug, cv_min=cfg.cv_min,
        set_1=cfg.cv_set_1, pool=cfg.cv_pool, pool_th=cfg.cv_pool_th))
    t_cv = timeit(cv, cur, look, poses, imgs)

    fps = cfg.batch_size / (t_step / 1000)
    print(f"full step        : {t_step:7.1f} ms  ({fps:5.2f} fps)")
    print(f"fwd loss only    : {t_fwd:7.1f} ms  (backward+opt = "
          f"{t_step - t_fwd:6.1f})")
    print(f"model fwd only   : {t_mdl:7.1f} ms  (DOMD+losses fwd = "
          f"{t_fwd - t_mdl:6.1f})")
    print(f"occlusion CV     : {t_cv:7.1f} ms  (fwd, standalone jit)")


if __name__ == "__main__":
    main()
