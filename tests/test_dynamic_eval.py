"""DynamicDepth eval_mode loop: one call prints both metric families
(standard + doj-restricted), `dynamicdepth/trainer.py:756-905,1158-1255`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.dynamic.evaluate import _metrics_one, evaluate_dynamic
from mal_tpu.dynamic.model import DynDepthModel

CFG = Config(height=64, width=96, num_depth_bins=16, method="dynamicdepth",
             batch_size=1, eval_split="eigen", split="eigen_zhou")


def test_metrics_one_perfect_pred_and_doj_restriction():
    rng = np.random.RandomState(0)
    gt = rng.uniform(2, 60, (60, 200)).astype(np.float64)
    doj = np.zeros((30, 100), np.float32)
    doj[10:20, 30:60] = 1.0
    err, doj_err, has = _metrics_one(gt, gt.astype(np.float32), doj,
                                     "eigen", "eigen_zhou")
    assert has == 1
    assert err["abs_rel"] < 1e-6 and err["a1"] == 1.0
    assert doj_err["abs_rel"] < 1e-6 and doj_err["a1"] == 1.0

    # all-zero doj mask -> no doj batch counted
    _, _, has0 = _metrics_one(gt, gt.astype(np.float32),
                              np.zeros((30, 100), np.float32),
                              "eigen", "eigen_zhou")
    assert has0 == 0


@pytest.mark.slow
def test_evaluate_dynamic_end_to_end():
    cfg = CFG
    model = DynDepthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = jax.device_get(synthetic_batch(cfg, rng, batch_size=1))
    batch["doj_mask"] = np.zeros((1, cfg.height, cfg.width), np.float32)
    batch["doj_mask"][:, 20:40, 30:60] = 1.0
    batch["doj_mask-1"] = batch["doj_mask"].copy()
    batch["doj_mask+1"] = batch["doj_mask"].copy()

    variables = model.init(rng, jax.tree.map(jnp.asarray, batch),
                           jnp.asarray(0.1), jnp.asarray(10.0),
                           jax.random.PRNGKey(1), train=False,
                           is_train_phase=False)
    variables = dict(variables)

    gt = np.random.RandomState(1).uniform(2, 60, (60, 200)).astype(np.float64)
    results = evaluate_dynamic(cfg, variables, [batch, batch], [gt, gt])

    # both metric families present and finite, for student and teacher
    for prefix in ("", "doj/", "mono/", "mono_doj/"):
        assert np.isfinite(results[prefix + "abs_rel"])
        assert 0.0 <= results[prefix + "a1"] <= 1.0
    assert results["n_images"] == 2.0
    assert results["doj_batches"] == 2.0
