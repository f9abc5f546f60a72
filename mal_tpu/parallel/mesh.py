"""Device-mesh data parallelism.

TPU-native replacement for the reference's distributed runtime (HuggingFace
Accelerate -> DDP over NCCL, `manydepth/trainer.py:309-311`; SURVEY.md §2.6):
a `jax.sharding.Mesh` with the global batch sharded over the `data` axis.
Under `jit`, XLA inserts the gradient all-reduce and makes every loss / metric
/ depth-bin reduction a global collective — no NCCL analogue needed.

The mesh is 1-D today (DP is the only strategy the reference has), but the
API takes an axis name so batch-axis sharding extends to multi-pod meshes
without change; `data_parallel_step` works for any number of devices
including 1.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"make_mesh({num_devices}) but only {len(devices)} "
                f"{devices[0].platform} device(s) are visible; refusing to "
                f"build a smaller mesh silently")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(num_data: int, num_depth: int,
                 axes: tuple[str, str] = ("data", "depth")) -> Mesh:
    """(data x depth) mesh: batch sharded on `data`, cost-volume depth
    planes sharded on `depth` — the domain's sequence-parallel axis
    (SURVEY.md §5: the 96-plane volume is the memory hot spot)."""
    n = num_data * num_depth
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"make_mesh_2d({num_data}x{num_depth}) needs {n} "
                         f"devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(num_data, num_depth), axes)


# --- trace-time mesh registry for in-model sharding constraints ------------
# Modules deep inside the model (the plane-sweep op) can't take a Mesh
# argument without breaking the frozen-Config plumbing; `mesh_context` is
# active while the step is traced and `constrain` becomes a no-op when no
# mesh (or no matching axis) is present, so the single-device path is
# untouched.
_LOCAL = threading.local()


@contextlib.contextmanager
def mesh_context(mesh: Mesh):
    prev = getattr(_LOCAL, "mesh", None)
    _LOCAL.mesh = mesh
    try:
        yield
    finally:
        _LOCAL.mesh = prev


def constrain(x: Any, *spec: str | None) -> Any:
    """`with_sharding_constraint(x, P(*spec))` against the context mesh;
    identity when no mesh is active or an axis name is absent from it."""
    mesh = getattr(_LOCAL, "mesh", None)
    if mesh is None:
        return x
    if any(s is not None and s not in mesh.axis_names for s in spec):
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every array in the batch pytree along its leading (batch) dim."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       axis: str = "data", n_extra_repl: int = 0) -> Callable:
    """jit a (state, batch, rng, epoch, *extras) step with DP in/out shardings.

    state/rng/epoch (and any extras — e.g. the frozen Mask2Former weights,
    which must be ARGUMENTS, not closure constants) replicated; batch sharded
    on the data axis. Gradients and all batch statistics reduce globally
    inside (XLA collectives over ICI).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    jitted = jax.jit(
        step_fn,
        in_shardings=(repl, data, repl, repl) + (repl,) * n_extra_repl,
        out_shardings=(repl, repl),
    )

    def run(*args):
        # trace (first call) under the mesh context so in-model `constrain`
        # calls resolve; later calls hit the jit cache
        with mesh_context(mesh):
            return jitted(*args)

    return run
