"""Pallas cost-volume kernel vs the XLA reference implementation.

The MSDeformAttn-test pattern from the reference (SURVEY.md §4): every Pallas
kernel is validated against its pure-jax twin. Runs in interpreter mode on
CPU; the same code compiles for TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.ops.cost_volume import compute_depth_bins, plane_sweep_cost_volume
from mal_tpu.ops.pallas.cost_volume_kernel import plane_sweep_cost_volume_pallas


def _inputs(B=2, F=2, h=12, w=20, C=8, seed=0, rot=0.0):
    rng = np.random.RandomState(seed)
    cur = rng.uniform(0, 1, (B, h, w, C)).astype(np.float32)
    lookup = rng.uniform(0, 1, (B, F, h, w, C)).astype(np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * w, 1.92 * h
    K[0, 2], K[1, 2] = 0.5 * w, 0.5 * h
    K = np.broadcast_to(K, (B, 4, 4)).copy()
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (B, F, 4, 4)).copy()
    poses[:, :, 0, 3] = rng.uniform(-0.3, 0.3, (B, F))
    poses[:, :, 1, 3] = rng.uniform(-0.05, 0.05, (B, F))
    poses[:, :, 2, 3] = rng.uniform(-0.2, 0.2, (B, F))
    if rot:
        c, s = np.cos(rot), np.sin(rot)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        poses[:, :, :3, :3] = R
    return cur, lookup, poses, K, np.linalg.inv(K)


@pytest.mark.parametrize("rot", [0.0, 0.05])
def test_pallas_cv_matches_xla(rot):
    cur, lookup, poses, K, invK = _inputs(rot=rot)
    poses[1, 1] = 0.0  # missing frame
    bins = compute_depth_bins(0.5, 10.0, 8, "linear")

    ref_cost, ref_missing = plane_sweep_cost_volume(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, chunk=4)
    pk_cost, pk_missing = plane_sweep_cost_volume_pallas(
        jnp.asarray(cur), jnp.asarray(lookup), jnp.asarray(poses),
        jnp.asarray(K), jnp.asarray(invK), bins, interpret=True)

    np.testing.assert_allclose(np.asarray(pk_cost), np.asarray(ref_cost),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(pk_missing), np.asarray(ref_missing))
