"""Instance matching across frames (jit-compatible, exact).

Re-design of `manydepth/matcher.py:63-255` (`HungarianMatcher`): cost =
class-mismatch + dice loss between instance masks of the current frame and
each warped adjacent frame, solved exactly. The reference ships the cost
matrices to the CPU for two `scipy.optimize.linear_sum_assignment` calls per
batch item (a device->host sync in the hot training loop); with the
static `max_instances <= 8` slot layout, exact assignment is a single
vectorized argmin over all N! permutations on-device — no host round trip.
"""

from __future__ import annotations

import itertools
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.segment.instances import Instances

Array = jax.Array

_BIG = 1e6


@lru_cache(maxsize=None)
def _permutations(n: int) -> np.ndarray:
    assert n <= 8, "permutation brute-force is for max_instances <= 8"
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def hungarian_match(cost: Array) -> Array:
    """Exact linear-sum assignment for a square (N, N) cost matrix, N <= 8.

    Returns `row_of_col`: for each column j, the assigned row index.
    Vectorized argmin over the N! permutation table — exact, deterministic,
    and jit/vmap-friendly.
    """
    n = cost.shape[0]
    perms = jnp.asarray(_permutations(n))          # (P, N): row for each col
    cols = jnp.arange(n)
    totals = cost[perms, cols[None, :]].sum(axis=1)  # (P,)
    best = jnp.argmin(totals)
    return perms[best]


def dice_cost(masks_a: Array, masks_b: Array) -> Array:
    """Pairwise dice loss between flattened masks: (Na, HW) x (Nb, HW) -> (Na, Nb).

    Same formula as mask2former's `batch_dice_loss` (used by
    `matcher.py:125-126`): 1 - (2ab + 1) / (|a| + |b| + 1).
    """
    num = 2.0 * jnp.einsum("nc,mc->nm", masks_a, masks_b)
    den = masks_a.sum(-1)[:, None] + masks_b.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def _pair_cost(inst: Instances, cur: Instances, b: None = None) -> Array:
    """Cost (N, N) between one frame's instances and the current frame's."""
    del b
    N = inst.classes.shape[0]
    class_cost = (inst.classes[:, None] != cur.classes[None, :]).astype(jnp.float32)
    m_a = inst.masks.reshape(N, -1)
    m_c = cur.masks.reshape(N, -1)
    cost = class_cost + dice_cost(m_a, m_c)
    invalid = ~(inst.valid[:, None] & cur.valid[None, :])
    return jnp.where(invalid, _BIG, cost)


def match_instances(inst_last: Instances, inst_next: Instances,
                    inst_cur: Instances):
    """Triplet matching (`matcher.py:89-173`) for a whole batch.

    For each current-frame slot j returns (last_idx, next_idx, pair_valid):
    the instance indices matched to j in both adjacent frames, valid only when
    both assignments involve real instances (the reference's intersection of
    the two assignments' target-index sets).
    """

    def one(last_b, next_b, cur_b):
        C1 = _pair_cost(last_b, cur_b)
        C2 = _pair_cost(next_b, cur_b)
        row1 = hungarian_match(C1)  # last index assigned to each cur slot
        row2 = hungarian_match(C2)
        cols = jnp.arange(C1.shape[0])
        ok1 = C1[row1, cols] < _BIG / 2
        ok2 = C2[row2, cols] < _BIG / 2
        return row1, row2, ok1 & ok2

    return jax.vmap(one)(inst_last, inst_next, inst_cur)
