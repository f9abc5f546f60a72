"""Pareto (MGDA) two-task gradient re-weighting — reconstruction.

The reference enables this path with `--pareto`
(`manydepth/options.py:440`): `compute_main_losses` calls
`pareto_fn(w_list, c_list, model, 2, loss_list)` with `c_list=[0.1, 0.3]`
and re-weights the photometric loss against the distillation loss
(`manydepth/loss_utils.py:256-263`). The module that defines `pareto_fn`
(`manydepth/pareto.py`, imported at `loss_utils.py:3`) is MISSING from the
reference snapshot (SURVEY.md §1 known defects), so — as with the DEQ
`lib/` solvers — this file is a reconstruction of the standard public
algorithm the call shape implies: the MGDA min-norm solver of
Sener & Koltun, "Multi-Task Learning as Multi-Objective Optimization"
(NeurIPS 2018), with per-task lower-bound constraints `c_list` keeping
both tasks alive (the constrained variant used by Pareto-MTL-style
methods).

For two tasks the min-norm point on the simplex has a closed form:

    w1* = clip( (g0 - g1) . g0 / ||g0 - g1||^2 ,  c1, 1 - c0 ),   w0* = 1 - w1*

(the unconstrained minimizer of ||(1-w1) g0 + w1 g1||^2, projected onto
the box the lower bounds allow). The weighted gradient `w0 g0 + w1 g1` is
then what the reference's `acc.backward(new_w0*loss + new_w1*distil)`
produces with weights treated as constants (`trainer.py:467-469`).

Unlike the torch version (which would re-run autograd inside the loss
function), the JAX path computes both gradient pytrees in the train step
(`train/step.py`, behind `cfg.pareto`) and combines them here — two
backward passes, fully jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _tree_dot(a, b) -> Array:
    leaves = jax.tree.leaves(
        jax.tree.map(lambda x, y: jnp.vdot(x.astype(jnp.float32),
                                           y.astype(jnp.float32)), a, b))
    return jnp.sum(jnp.stack(leaves))


def pareto_weights_2task(g0, g1, c0: float = 0.1, c1: float = 0.3):
    """Min-norm convex combination of two gradient pytrees.

    Returns (w0, w1) with w0 + w1 = 1, w0 >= c0, w1 >= c1, minimizing
    ||w0 g0 + w1 g1||^2 subject to those bounds. Matches the reference's
    `c_list=[0.1, 0.3]` defaults (`manydepth/loss_utils.py:258`).
    """
    d00 = _tree_dot(g0, g0)
    d11 = _tree_dot(g1, g1)
    d01 = _tree_dot(g0, g1)
    denom = d00 - 2.0 * d01 + d11          # ||g0 - g1||^2
    # unconstrained minimizer over w1 of ||(1-w1) g0 + w1 g1||^2
    w1 = jnp.where(denom > 1e-12, (d00 - d01) / jnp.maximum(denom, 1e-12),
                   0.5)
    w1 = jnp.clip(w1, c1, 1.0 - c0)
    return 1.0 - w1, w1


def pareto_combine_grads(g0, g1, c0: float = 0.1, c1: float = 0.3):
    """Weighted-sum gradient pytree + the weights (for logging).

    `g0`/`g1`: gradients of the photometric and distillation losses w.r.t.
    the same trainable params. Returns (grads, w0, w1).
    """
    w0, w1 = pareto_weights_2task(g0, g1, c0, c1)
    grads = jax.tree.map(lambda a, b: w0 * a + w1 * b, g0, g1)
    return grads, w0, w1
