"""DualRefine peak-HBM accounting at the reference geometry (192x640).

AOT-compiles the full DualRefine training step (no execution, so shapes
that exceed the 16 GB v5e still compile) and prints XLA's memory_analysis
for a batch sweep — the measured answer to whether the phantom-step
`jax.checkpoint` (mal_tpu/dualref/model.py) + bf16 HRNet trunks admit the
reference batch 12 (`dualrefine/options.py` default) on a 16 GB chip.

Usage: python benchmarks/bench_dualref_mem.py [B ...]   (default 8 12)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from mal_tpu.config import TRAIN_FAST_SETTINGS, Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.dualref.model import DEQDepthPose
from mal_tpu.dualref.step import make_dualref_train_step
from mal_tpu.losses import LossBalancerState
from mal_tpu.train.state import DepthBinTracker, TrainState, make_optimizer


def measure(B: int, fast: bool) -> None:
    cfg = Config(height=192, width=640, batch_size=B, method="dualrefine",
                 frame_ids=(0, -1))
    if fast:
        cfg = cfg.replace(**TRAIN_FAST_SETTINGS)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)

    model = DEQDepthPose(cfg)
    # shape-only init (abstract) so the host never materializes B=12 params
    variables = jax.eval_shape(
        lambda: model.init(rng, batch["color_aug"]["0"],
                           batch["color_aug"]["-1"], batch["K"],
                           invert=True, train=True))
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=jax.eval_shape(lambda p: tx.init(p), variables["params"]),
        bins=jax.eval_shape(DepthBinTracker.create),
        balancer=jax.eval_shape(LossBalancerState.create))
    step = jax.jit(make_dualref_train_step(cfg, model, tx),
                   donate_argnums=(0,))
    compiled = step.lower(
        state, jax.eval_shape(lambda: batch),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        jax.ShapeDtypeStruct((), jnp.float32)).compile()
    m = compiled.memory_analysis()
    gb = 1024 ** 3
    try:
        total = (m.temp_size_in_bytes + m.argument_size_in_bytes
                 + m.output_size_in_bytes - m.alias_size_in_bytes)
        print(f"B={B:2d} {'bf16' if fast else 'fp32'}: "
              f"temp {m.temp_size_in_bytes / gb:6.2f} GiB  "
              f"args {m.argument_size_in_bytes / gb:5.2f}  "
              f"out {m.output_size_in_bytes / gb:5.2f}  "
              f"alias {m.alias_size_in_bytes / gb:5.2f}  "
              f"peak~ {total / gb:6.2f} GiB  "
              f"{'FITS' if total < 15.5 * gb else 'OOM'} on 16 GB v5e")
    except AttributeError:
        print(f"B={B} {'bf16' if fast else 'fp32'}: {m}")


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 12]
    for B in bs:
        for fast in (True, False):
            measure(B, fast)


if __name__ == "__main__":
    main()
