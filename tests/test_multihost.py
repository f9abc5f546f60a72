"""Multi-host DCN bring-up test: 2 real processes, jax.distributed over
localhost, a global 4-device CPU mesh, per-process input shards, and a
psum-reduced step — the CPU-runnable stand-in for multi-host TPU training
(SURVEY.md §2.6; the reference's only multi-node story is Accelerate/DDP)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mal_tpu.parallel import (initialize_distributed, is_multihost,
                                  make_global_mesh, shard_host_batch)

    pid = int(sys.argv[1])
    initialize_distributed("localhost:{port}", 2, pid)
    assert is_multihost()
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    mesh = make_global_mesh()
    assert mesh.devices.size == 4

    # each process contributes its own half of the global batch (8 items)
    local = {{"x": np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * pid}}
    gbatch = shard_host_batch(local, mesh)
    assert gbatch["x"].shape == (8, 2)

    @jax.jit
    def step(b):
        return jnp.sum(b["x"])

    total = float(step(gbatch))
    expected = float(np.arange(8).reshape(4, 2).sum() * 2 + 100 * 8)
    assert total == expected, (total, expected)
    print(f"proc {{pid}} OK total={{total}}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_cpu(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO, port=port))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO

    procs = [subprocess.Popen([sys.executable, str(script), str(pid)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
