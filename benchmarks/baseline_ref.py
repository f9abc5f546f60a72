"""Derived reference baseline: time the reference's OWN training step.

`bench.py` needs a defensible denominator for `vs_baseline`. The reference
publishes no throughput numbers (SURVEY.md §6), and no A100 exists here —
but `/root/reference` itself runs on this host's CPU, and so does the
mal_tpu step under JAX's CPU backend. Timing BOTH on identical hardware,
identical config, identical synthetic data isolates the framework/step
implementation difference; the same-hardware ratio

    R = torch_cpu_step_time / jax_cpu_step_time

is then a measured, reproducible baseline multiplier: "the mal_tpu step is
R x faster than the reference's step on the same silicon." BASELINE.md
documents how bench.py folds this into vs_baseline.

Subcommands (run each in a fresh process — the JAX backend must be forced
to CPU before first use):

    python benchmarks/baseline_ref.py torch   # reference Trainer.process_batch + backward
    python benchmarks/baseline_ref.py jax     # mal_tpu train step, CPU backend

Each prints one JSON line {"which", "step_seconds", "batch_size", "fps"}.
The torch side executes `manydepth/trainer.py:555-644` (process_batch) +
`acc.backward` + `optimizer.step` — the exact per-step work of
`run_epoch` (`trainer.py:464-470`) minus logging/validation — via the
reference's own Trainer with the tests/ref_oracle shims.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".."))
sys.path.insert(0, REPO)

H, W = 192, 640
BATCH = 4
N_TIMED = 2


def _make_tree(root: pathlib.Path):
    from tests.ref_oracle.synth import make_kitti_tree, write_split

    # enough items that every timed index_iter stays inside LossBalancing's
    # per-epoch score table (`loss_utils.py:303-318`)
    data, files = make_kitti_tree(root, BATCH * 3, raw_hw=(160, 512))
    write_split(root, "eigen_zhou", files)
    sp = root / "splits" / "eigen_zhou"
    (sp / "train_files.txt").write_text("\n".join(files) + "\n")
    (sp / "test_files.txt").write_text("\n".join(files[:2]) + "\n")
    return data


def run_torch():
    from tests.ref_oracle.stubs import install_reference_shims

    install_reference_shims()
    import torch
    from accelerate import Accelerator

    root = pathlib.Path("/tmp/baseline_ref_tree")
    root.mkdir(exist_ok=True)
    data = _make_tree(root)
    os.chdir(root)
    os.makedirs("ckpt", exist_ok=True)

    from manydepth.options import MonodepthOptions
    from manydepth.trainer import Trainer

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", data, "--weights_init", "scratch",
        "--height", str(H), "--width", str(W), "--batch_size", str(BATCH),
        "--num_workers", "0", "--split", "eigen_zhou",
        "--distil", "--loss_blc",
    ])
    torch.manual_seed(0)
    acc = Accelerator(cpu=True)
    trainer = Trainer(opt, acc)
    trainer.epoch = 0
    trainer.step = 1
    trainer.current_lambda_for_adjust = max(
        opt.lambda_for_adjust_start, opt.lambda_for_adjust_min)
    trainer.model.train()

    inputs = next(iter(trainer.train_loader))

    def one_step(i):
        outputs, losses = trainer.process_batch(dict(inputs), i, is_train=True)
        trainer.model_optimizer.zero_grad()
        acc.backward(losses["loss"])
        trainer.model_optimizer.step()
        return float(losses["loss"].detach())

    one_step(0)  # warmup (allocator, autograd graph caches)
    t0 = time.perf_counter()
    for i in range(N_TIMED):
        loss = one_step(1 + i)
    dt = (time.perf_counter() - t0) / N_TIMED
    print(json.dumps({"which": "torch_cpu", "step_seconds": round(dt, 3),
                      "batch_size": BATCH, "fps": round(BATCH / dt, 3),
                      "loss": loss}))


def run_jax():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    # fp32 exact mode: the torch side runs fp32 on CPU, so compare fp32
    cfg = Config(height=H, width=W, batch_size=BATCH)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx), donate_argnums=(0,))
    epoch = jnp.zeros(())
    state, metrics = step(state, batch, jax.random.PRNGKey(1), epoch)
    loss = float(jax.device_get(metrics["loss"]))
    t0 = time.perf_counter()
    for i in range(N_TIMED):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i), epoch)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / N_TIMED
    print(json.dumps({"which": "jax_cpu", "step_seconds": round(dt, 3),
                      "batch_size": BATCH, "fps": round(BATCH / dt, 3),
                      "loss": loss}))


if __name__ == "__main__":
    {"torch": run_torch, "jax": run_jax}[sys.argv[1]]()
