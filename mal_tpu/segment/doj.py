"""Online dynamic-object (doj) mask generation with the jax Mask2Former.

The reference consumes PRE-computed per-frame dynamic-object masks from
`.npy` files (`dynamicdepth/datasets/cityscapes_preprocessed_dataset.py:
70-83`, `kitti_dataset.py:96-117`) produced by an external segmentation run
it does not ship. mal_tpu closes that tooling gap natively: the same frozen
Mask2Former that powers the MAL temporal hint generates the masks inside
the jitted training step — the union of instance masks whose class is a
movable street-object category and whose score clears the threshold. One
batched segmenter forward per frame, on-device, no file preprocessing.

Enabled with `Config.online_doj` (DynamicDepth method); the precomputed
`--doj_root` path remains the reference-parity default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mal_tpu.segment.instances import Instances
from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn

Array = jax.Array

# COCO "thing" categories that move in street scenes: person, bicycle, car,
# motorcycle, bus, train, truck (indices in the 80-class contiguous order).
DYNAMIC_COCO_CLASSES = (0, 1, 2, 3, 5, 6, 7)


def doj_from_instances(inst: Instances, dynamic_classes=DYNAMIC_COCO_CLASSES,
                       score_threshold: float = 0.5) -> Array:
    """Union of dynamic-class instance masks -> (B, H, W) float {0, 1}."""
    dyn = jnp.asarray(dynamic_classes, jnp.int32)
    is_dyn = (inst.classes[..., None] == dyn[None, None]).any(-1)  # (B, N)
    keep = is_dyn & (inst.scores > score_threshold) & inst.valid
    union = (inst.masks * keep[..., None, None].astype(inst.masks.dtype)
             ).sum(axis=1)
    return jnp.clip(union, 0.0, 1.0)


def make_doj_fn(model: Mask2Former, max_instances: int = 16,
                score_threshold: float = 0.5,
                dynamic_classes=DYNAMIC_COCO_CLASSES):
    """Build `doj_fn(seg_variables, images (B,H,W,3)) -> (B,H,W)` masks.

    Weights flow as an argument (same reasoning as `make_seg_fn`: closures
    embed the Swin-L pytree as jit constants).
    """
    seg_fn = make_seg_fn(model, None, max_instances, mask_threshold=0.0)

    def doj_fn(seg_variables, images: Array) -> Array:
        inst = seg_fn(seg_variables, images)
        return jax.lax.stop_gradient(
            doj_from_instances(inst, dynamic_classes, score_threshold))

    return doj_fn
