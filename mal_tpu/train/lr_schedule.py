"""Learning-rate schedules (optax).

`warmup_step_schedule` reproduces the reference's `WarmupStepLRScheduler`
(`manydepth/lr_scheduler.py:30-71`): linear warmup from `init_lr` to `peak_lr`
over `warmup_steps`, then a 10x decay every `decay_steps`.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_step_schedule(init_lr: float = 1e-10, peak_lr: float = 1e-4,
                         warmup_steps: int = 500, decay_steps: int = 48000,
                         decay_scale: float = 0.1) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (peak_lr - init_lr) * jnp.minimum(step, warmup_steps) / max(warmup_steps, 1)
        n_decays = jnp.floor(jnp.maximum(step, 0.0) / decay_steps)
        return warm * decay_scale ** n_decays
    return schedule


def step_lr_schedule(peak_lr: float, step_size_epochs: int,
                     steps_per_epoch: int,
                     decay_scale: float = 0.1) -> optax.Schedule:
    """torch `StepLR(optimizer, scheduler_step_size, 0.1)` stepped once per
    epoch (`dualrefine/trainer.py:104-105,272`; manydepth `--step_lr`):
    lr = peak * 0.1^floor(epoch / step_size)."""
    if steps_per_epoch <= 0:
        raise ValueError("step_lr_schedule needs steps_per_epoch > 0 "
                         "(the trainer sets Config.steps_per_epoch from "
                         "len(train_loader))")

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / steps_per_epoch)
        return peak_lr * decay_scale ** jnp.floor(
            epoch / max(step_size_epochs, 1))
    return schedule
