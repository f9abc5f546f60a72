"""Bitwise run-to-run determinism: all stochasticity is PRNG-keyed
(SURVEY.md §5 — the reference relies on seed_all + cudnn.deterministic and
still has nondeterministic CUDA kernels; here two identical runs must agree
exactly)."""

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.models import MALModel
from mal_tpu.train.state import create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step

CFG = Config(height=64, width=96, num_depth_bins=16, batch_size=2)


def _run_two_steps():
    model = MALModel(CFG)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(CFG, rng, batch_size=2)
    state = create_train_state(CFG, model, rng, batch)
    tx = make_optimizer(CFG)
    step = jax.jit(make_train_step(CFG, model, tx))
    losses = []
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(7 + i),
                              jnp.zeros(()))
        losses.append(float(metrics["loss"]))
    return losses, jax.tree.leaves(state.params)[0]


def test_training_is_bitwise_reproducible():
    l1, p1 = _run_two_steps()
    l2, p2 = _run_two_steps()
    assert l1 == l2  # exact equality, not allclose
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
