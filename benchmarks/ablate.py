"""Step-time ablation: locate where the 238 ms goes (round-3 perf work).

Times the full jit train step under structural ablations, plus isolated
forward/backward pieces. All numbers are steady-state wall clock on the
attached chip; prints one line per variant.

Usage: python benchmarks/ablate.py [variant ...]
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


def time_step(cfg, n_iters=10):
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    epoch = jnp.zeros(())
    state, metrics = step(state, batch, jax.random.PRNGKey(1), epoch)
    float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i), epoch)
    float(jax.device_get(metrics["loss"]))
    return (time.perf_counter() - t0) / n_iters


def time_forward(cfg, n_iters=10):
    """Model forward only (no loss, no grad)."""
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel

    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.1),
                           jnp.asarray(10.0), rng, train=True)

    @jax.jit
    def fwd(v, b, key):
        out, _ = model.apply(v, b, jnp.asarray(0.1), jnp.asarray(10.0), key,
                             train=True, mutable=["batch_stats"])
        return out["disp"]

    d = fwd(variables, batch, rng)
    jax.device_get(d[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        d = fwd(variables, batch, jax.random.PRNGKey(i))
    jax.device_get(d[0, 0, 0])
    return (time.perf_counter() - t0) / n_iters


def time_loss_forward(cfg, n_iters=10):
    """Full loss_fn forward (model + warps + losses), no backward: patch
    jax.grad inside make_train_step to a value-only evaluation."""
    from unittest import mock

    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    def fake_grad(f, has_aux=False):
        def run(p):
            val, aux = f(p)
            return jax.tree.map(jnp.zeros_like, p), aux
        return run

    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    with mock.patch("jax.grad", fake_grad):
        step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
        epoch = jnp.zeros(())
        state, metrics = step(state, batch, jax.random.PRNGKey(1), epoch)
        float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, metrics = step(state, batch, jax.random.PRNGKey(2 + i),
                                  epoch)
        float(jax.device_get(metrics["loss"]))
    return (time.perf_counter() - t0) / n_iters


def main():
    from mal_tpu.config import TRAIN_FAST_SETTINGS, Config

    base = Config(height=192, width=640, batch_size=12)
    fast = base.replace(**TRAIN_FAST_SETTINGS)

    variants = {
        "fast": lambda: time_step(fast),
        "forward_only": lambda: time_forward(fast),
        "loss_fwd": lambda: time_loss_forward(fast),
        "no_distil": lambda: time_step(fast.replace(distil=False,
                                                    use_ensemble=False)),
        "no_loss_blc": lambda: time_step(fast.replace(loss_blc=False)),
        "remat": lambda: time_step(fast.replace(remat=True)),
        "no_aug": lambda: time_step(fast.replace(
            no_matching_augmentation=True)),
        "freeze_teacher": lambda: time_step(fast.replace(
            freeze_teacher_and_pose=True)),
        "bins48": lambda: time_step(fast.replace(num_depth_bins=48)),
        "xla_cv": lambda: time_step(fast.replace(use_pallas=False)),
        "batch24": lambda: time_step(fast.replace(batch_size=24), 5),
    }
    want = sys.argv[1:] or list(variants)
    for name in want:
        try:
            dt = variants[name]()
            print(f"{name:16s} {dt * 1000:8.1f} ms   "
                  f"{fastcfg_bs(name) / dt:6.1f} fps")
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}")


def fastcfg_bs(name):
    return 24 if name == "batch24" else 12


if __name__ == "__main__":
    main()
