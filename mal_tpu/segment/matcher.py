"""Instance matching across frames (jit-compatible, exact).

Re-design of `manydepth/matcher.py:63-255` (`HungarianMatcher`): cost =
class-mismatch + dice loss between instance masks of the current frame and
each warped adjacent frame, solved exactly. The reference ships the cost
matrices to the CPU for two `scipy.optimize.linear_sum_assignment` calls per
batch item (a device->host sync in the hot training loop); here the exact
assignment runs on-device as an O(N^3) Jonker-Volgenant shortest-augmenting-
path solve under `lax.while_loop`, so `max_instances` scales to 32+ (the
reference caps instances only by its 100 queries,
`mask2former/maskformer_model.py:361-380`) with no host round trip and no
N! table.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mal_tpu.segment.instances import Instances

Array = jax.Array

_BIG = 1e6
_INF = jnp.inf


@lru_cache(maxsize=None)
def _permutations(n: int) -> np.ndarray:
    assert n <= 8, "permutation brute-force is for testing small N only"
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def hungarian_match_bruteforce(cost: Array) -> Array:
    """Reference implementation: argmin over the N! permutation table
    (N <= 8). Kept as the equivalence oracle for `hungarian_match`."""
    n = cost.shape[0]
    perms = jnp.asarray(_permutations(n))          # (P, N): row for each col
    cols = jnp.arange(n)
    totals = cost[perms, cols[None, :]].sum(axis=1)  # (P,)
    best = jnp.argmin(totals)
    return perms[best]


def hungarian_match(cost: Array) -> Array:
    """Exact linear-sum assignment for a square (N, N) cost matrix, any N.

    Returns `row_of_col`: for each column j, the assigned row index. Same
    optimum as `scipy.optimize.linear_sum_assignment` (assignments may
    differ on exact cost ties). Jonker-Volgenant dual-potential shortest-
    augmenting-path form; every inner step is a vectorized O(N) sweep, the
    data-dependent loop lengths are bounded by N via `lax.while_loop`.
    """
    n = cost.shape[0]
    # pad with a virtual column 0 (1-indexed classic formulation)
    C = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))

    def assign_row(i, carry):
        u, v, p = carry
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF)
        used = jnp.zeros((n + 1,), bool)
        way = jnp.zeros((n + 1,), jnp.int32)

        def cond(s):
            _, _, _, _, _, j0, done = s
            return ~done

        def body(s):
            u, v, minv, used, way, j0, _ = s
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = C[i0] - u[i0] - v            # (n+1,)
            better = (cur < minv) & ~used
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, _INF, minv)
            masked = masked.at[0].set(_INF)
            j1 = jnp.argmin(masked)
            delta = masked[j1]
            # dual update: used columns' rows gain delta, others shrink minv
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] == 0
            return (u, v, minv, used, way, j1, done)

        u, v, minv, used, way, j0, _ = lax.while_loop(
            cond, body, (u, v, minv, used, way, jnp.int32(0), False))

        # augment along the alternating path back to the virtual column
        def aug_cond(s):
            p, j0 = s
            return j0 != 0

        def aug_body(s):
            p, j0 = s
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    u0 = jnp.zeros((n + 1,))
    v0 = jnp.zeros((n + 1,))
    p0 = jnp.zeros((n + 1,), jnp.int32)
    _, _, p = lax.fori_loop(1, n + 1, assign_row, (u0, v0, p0))
    return p[1:] - 1  # row index (0-based) assigned to each column


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
