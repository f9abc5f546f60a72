"""Train-step throughput for the other two method families on the chip.

bench.py's headline covers ManyDepth+MAL; this measures the DynamicDepth
and DualRefine jit train steps at their reference default configurations
(`/root/reference/dynamicdepth/options.py:60-95`: 192x512 batch 14;
`/root/reference/dualrefine/options.py:53-105`: 192x640 batch 12) on
synthetic batches, steady state, fast-training mode and exact fp32.

Usage: python benchmarks/bench_methods.py [dynamic] [dualref]
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


def timeit_step(step, state, batch, iters=8):
    s, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss), loss
    best = float("inf")
    # state chains across rounds (never reset): the steps are built with
    # donate_argnums=(0,), so a consumed state must not be re-passed —
    # and donation is what lets the DualRefine reference B=12 fit v5e
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            s, metrics = step(s, batch, jax.random.PRNGKey(2 + i),
                              jnp.zeros(()))
        float(jax.device_get(metrics["loss"]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_dynamic(fast: bool) -> None:
    from mal_tpu.dynamic.model import DynDepthModel
    from mal_tpu.dynamic.step import make_dynamic_train_step
    from mal_tpu.train.state import create_train_state, make_optimizer

    cfg = Config(height=192, width=512, batch_size=14,
                 method="dynamicdepth", cv_min=True, cv_set_1=True,
                 cv_pool_th=0.15)
    if fast:
        cfg = cfg.replace(**TRAIN_FAST_SETTINGS)
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
    step = jax.jit(make_dynamic_train_step(cfg, model, make_optimizer(cfg)))
    dt = timeit_step(step, state, batch)
    print(f"dynamicdepth {'bf16' if fast else 'fp32'} 192x512 B14: "
          f"{dt * 1e3:7.1f} ms/step  {cfg.batch_size / dt:6.2f} fps")


def bench_dualref(fast: bool) -> None:
    from mal_tpu.dualref.model import DEQDepthPose
    from mal_tpu.dualref.step import make_dualref_train_step
    from mal_tpu.losses import LossBalancerState
    from mal_tpu.train.state import DepthBinTracker, TrainState, make_optimizer

    # Reference geometry. The reference default batch 12 was sized for
    # 80 GB A100s: it compiled to 19.75 GB HBM before the epipolar-cost
    # D-chunking (round 4, mal_tpu/dualref/corr.py), 17.25 GB after, and
    # with the phantom-step jax.checkpoint + bf16 HRNet/pose trunks
    # (round 5) the fast mode measures 15.27 GiB peak — the FULL reference
    # batch 12 fits a 16 GB v5e in fast mode (bench_dualref_mem.py).
    # fp32 is 15.86 GiB — over the line — so it benches at B=8.
    cfg = Config(height=192, width=640, batch_size=12 if fast else 8,
                 method="dualrefine", frame_ids=(0, -1))
    if fast:
        cfg = cfg.replace(**TRAIN_FAST_SETTINGS)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)

    model = DEQDepthPose(cfg)
    variables = model.init(rng, batch["color_aug"]["0"],
                           batch["color_aug"]["-1"], batch["K"],
                           invert=True, train=True)
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       bins=DepthBinTracker.create(),
                       balancer=LossBalancerState.create())
    # Donation only on the fast path (it is what makes B=12 fit). On the
    # fp32 step, donation-induced buffer aliasing changes XLA fusion enough
    # to surface a latent numeric fragility: an intermediate DEQ iterate's
    # depth can go NaN, reaching the total only through the smoothness term
    # (the masked reprojection hides NaN coords behind clipped gather
    # indices). Probed 2026-08-21: same program, donate -> loss=nan,
    # no-donate -> 1.1814 with all components finite. fp32 benches
    # undonated (round-4 behavior); fragility noted in HISTORY.md round 5.
    kw = dict(donate_argnums=(0,)) if fast else {}
    step = jax.jit(make_dualref_train_step(cfg, model, tx), **kw)
    dt = timeit_step(step, state, batch)
    print(f"dualrefine   {'bf16' if fast else 'fp32'} 192x640 "
          f"B{cfg.batch_size:<2d}: "
          f"{dt * 1e3:7.1f} ms/step  {cfg.batch_size / dt:6.2f} fps")


def main():
    which = set(sys.argv[1:]) or {"dynamic", "dualref"}
    if "dynamic" in which:
        bench_dynamic(fast=True)
        bench_dynamic(fast=False)
    if "dualref" in which:
        bench_dualref(fast=True)
        bench_dualref(fast=False)


if __name__ == "__main__":
    main()
