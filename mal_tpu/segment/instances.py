"""Static-shape instance segmentation results.

The reference passes detectron2 `Instances` objects (variable-length) through
the temporal hint (`manydepth/dyn_utils.py:121-170`). For jit-compatibility we
use a fixed `max_instances` slot layout with validity masks — SURVEY.md §7.3
"dynamic shapes from segmentation".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Instances(NamedTuple):
    """Padded per-image instances.

    masks:   (B, N, H, W) float binary masks
    classes: (B, N) int32 class ids (-1 for empty slots)
    scores:  (B, N) float confidence
    valid:   (B, N) bool slot validity
    """
    masks: Array
    classes: Array
    scores: Array
    valid: Array

    @classmethod
    def empty(cls, batch: int, n: int, height: int, width: int) -> "Instances":
        return cls(
            masks=jnp.zeros((batch, n, height, width), jnp.float32),
            classes=jnp.full((batch, n), -1, jnp.int32),
            scores=jnp.zeros((batch, n), jnp.float32),
            valid=jnp.zeros((batch, n), bool),
        )

    def threshold(self, score_thresh: float) -> "Instances":
        """Drop low-confidence instances (`dyn_utils.py:140`)."""
        keep = self.valid & (self.scores > score_thresh)
        return self._replace(valid=keep,
                             masks=self.masks * keep[..., None, None])
