"""Checkpointing: one orbax-saved pytree + a json metadata sidecar.

Replaces the reference's directory-of-`.pth` format
(`manydepth/trainer.py:1605-1636`: model.pth + track.pth + adam.pth +
opt.json) with a single TrainState pytree (params, BN stats, optimizer state,
depth bins, loss-balancer) plus `config.json`.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from mal_tpu.config import Config


def save_checkpoint(ckpt_dir: str, state: Any, cfg: Config, step: int | None = None):
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def load_checkpoint(path: str, state_template: Any) -> Any:
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(state_template))
    return restored


def load_config(ckpt_dir: str) -> Config:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return Config.from_json(f.read())
