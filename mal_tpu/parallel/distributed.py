"""Multi-host (DCN) distributed runtime.

The reference launches multi-GPU training with `accelerate launch
--multi_gpu` -> one DDP process per GPU over NCCL
(`/root/reference/manydepth/train.py:44-46`, SURVEY.md §2.6). The TPU-native
equivalent is multi-controller JAX: one process per host,
`jax.distributed.initialize` over DCN, a global `Mesh` spanning every chip,
and per-host input sharding — XLA routes in-slice collectives over ICI and
cross-slice ones over DCN; no NCCL analogue exists in user code.

Launch (one command per host):

    python -m mal_tpu.cli train ... \
        --coordinator host0:9999 --num_hosts N --host_id i

Each host's DataLoader reads a disjoint shard
(`DataLoader(..., shard=(process_index, process_count))`) and
`shard_host_batch` assembles the host-local arrays into one global
jax.Array sharded over the data axis.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_ids=None) -> None:
    """`jax.distributed.initialize` wrapper (idempotent per process)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_mesh(axis: str = "data"):
    """1-D data mesh over every device in the *global* (multi-host) system."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_host_batch(batch: Any, mesh, axis: str = "data") -> Any:
    """Host-local batch shard -> global jax.Array sharded on the data axis.

    Every process passes its own loader's slice (global_batch/num_hosts
    items); `jax.make_array_from_process_local_data` stitches them into the
    global array without any host gathering the full batch.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, batch)


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
