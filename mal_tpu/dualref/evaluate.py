"""DualRefine evaluation (`dualrefine/evaluate_depth.py:67-317`).

Protocol: run `DEQDepthPose` on [frame 0, frame -1] with invert=True and all
sides 0 (`evaluate_depth.py:177-178`), take the refined full-res disparity
`("disp", 0, 1)` and fall back to the initial `("disp", 0, 0)` for samples
whose lookup frame is the all-zeros dummy (`:169-181`), convert with the
*training* depth range (`:183`), then the standard crop/median-scale/7-metric
pipeline shared with ManyDepth eval.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu import geometry
from mal_tpu.config import Config

Array = jax.Array


def infer_disparities_dualref(model, variables, batches: Iterable[dict],
                              cfg: Config) -> np.ndarray:
    """Returns (N, H, W) scaled disparities for `evaluate_depth_maps`."""

    def forward(batch):
        img0 = batch["color"]["0"]
        imgm1 = batch["color"]["-1"]
        out, _ = model.apply(variables, img0, imgm1, batch["K"],
                             invert=True, train=False, mutable=False)
        zero_lookup = jnp.sum(imgm1, axis=(1, 2, 3)) == 0
        disp = jnp.where(zero_lookup[:, None, None, None],
                         out["disp_0_0"], out["disp_0_1"])
        scaled, _ = geometry.disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        return scaled[..., 0]

    fwd = jax.jit(forward)
    disps = [np.asarray(fwd(jax.tree.map(jnp.asarray, b))) for b in batches]
    return np.concatenate(disps, axis=0)
