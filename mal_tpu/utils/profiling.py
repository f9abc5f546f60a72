"""Profiling / tracing utilities (SURVEY.md §5 aux subsystems).

The reference only has ad-hoc wall-clock prints
(`manydepth/evaluate_depth.py:175-176`, `trainer.py:1521-1531`); the
TPU-native equivalents here are xprof traces + forced-materialization step
timing (block_until_ready alone does not flush remote-attached devices).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mal_tpu_trace"):
    """Capture an xprof trace (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1,
            **kwargs) -> dict:
    """Steady-state timing with forced materialization of one output leaf."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.device_get(jax.tree.leaves(result)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.device_get(jax.tree.leaves(result)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return {"mean_ms": dt * 1000.0, "iters": iters}


class ExamplesPerSec:
    """Throughput meter (the reference's unused `log_time` helper,
    `manydepth/trainer.py:1521-1531`, actually wired up)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = time.perf_counter()
        self._count = 0
        self.value = 0.0

    def update(self, batch_size: int) -> float:
        self._count += batch_size
        if self._count >= self.window * batch_size:
            now = time.perf_counter()
            self.value = self._count / (now - self._t0)
            self._t0 = now
            self._count = 0
        return self.value
