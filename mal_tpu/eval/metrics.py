"""Depth evaluation metrics.

The 7 standard metrics (`manydepth/evaluate_depth.py:35-53` /
`manydepth/layers.py:260-278` — the reference keeps numpy and torch copies
that must agree; here there is one jnp implementation that runs on both CPU
and TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# Eval protocol constants (`manydepth/evaluate_depth.py:32,296-297`).
MIN_DEPTH = 1e-3
MAX_DEPTH_KITTI = 80.0
MAX_DEPTH_DDAD = 200.0
STEREO_SCALE_FACTOR = 5.4

# Garg/eigen crop as fractions of (H, W) (`manydepth/evaluate_depth.py:230-237`)
EVAL_CROPS = {
    "eigen": (0.40810811, 0.99189189, 0.03594771, 0.96405229),
    # CityScapes center crop [256:, 192:1856] on 1024x2048 after 75% pre-crop
    "cityscapes": None,
}


def compute_depth_errors(gt: Array, pred: Array):
    """7 metrics over flat, already-masked gt/pred vectors."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32))

    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return dict(abs_rel=abs_rel, sq_rel=sq_rel, rmse=rmse, rmse_log=rmse_log,
                a1=a1, a2=a2, a3=a3)


def compute_depth_errors_np(gt: np.ndarray, pred: np.ndarray) -> dict:
    """Numpy twin for host-side eval loops; same formulas."""
    thresh = np.maximum(gt / pred, pred / gt)
    return dict(
        abs_rel=float(np.mean(np.abs(gt - pred) / gt)),
        sq_rel=float(np.mean((gt - pred) ** 2 / gt)),
        rmse=float(np.sqrt(np.mean((gt - pred) ** 2))),
        rmse_log=float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))),
        a1=float(np.mean(thresh < 1.25)),
        a2=float(np.mean(thresh < 1.25 ** 2)),
        a3=float(np.mean(thresh < 1.25 ** 3)),
    )
