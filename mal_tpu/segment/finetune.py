"""Segmenter fine-tuning: COCO-style targets -> padded tensors + jit step.

The reference trains Mask2Former through detectron2's dataset registry and
`MaskFormerInstanceDatasetMapper` (`mask2former/data/dataset_mappers/...` —
annotation dicts with RLE/binary-mask segmentations, ragged per image).
mal_tpu's TPU-shaped equivalent: a host-side mapper that decodes COCO
segmentations into the STATIC (labels, masks, valid) layout
`segment/criterion.py` trains on, and a jit train step around
`mask2former_train_loss`.

Covered here:
- uncompressed COCO RLE decode (column-major runs, the `{"counts": [...],
  "size": [h, w]}` format of pycocotools' `frPyObjects` output) and raw
  binary masks;
- category-id -> contiguous-index mapping (COCO ids are sparse);
- padding/truncation to a static `max_instances` with a validity mask;
- `make_seg_finetune_step`: loss + optax update, jit-able, weights as
  arguments.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mal_tpu.segment.criterion import CriterionConfig
from mal_tpu.segment.mask2former import Mask2Former, mask2former_train_loss

Array = jax.Array


def rle_decode(counts: Sequence[int], size: Sequence[int]) -> np.ndarray:
    """Uncompressed COCO RLE -> (H, W) uint8 mask.

    COCO runs are COLUMN-major (Fortran order) and start with a
    background run (possibly 0)."""
    h, w = int(size[0]), int(size[1])
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for run in counts:
        run = int(run)
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    assert pos == h * w, f"RLE covers {pos} px, expected {h * w}"
    return flat.reshape((w, h)).T  # column-major


def category_index(category_ids: Sequence[int]) -> dict[int, int]:
    """Sparse COCO category ids -> contiguous [0, K) indices (the
    detectron2 `thing_dataset_id_to_contiguous_id` mapping)."""
    return {int(c): i for i, c in enumerate(sorted(set(map(int,
                                                           category_ids))))}


def coco_to_targets(annotations: Sequence[dict], height: int, width: int,
                    max_instances: int,
                    cat_index: dict[int, int] | None = None):
    """One image's COCO-style annotation list -> padded static targets.

    Each annotation: {"category_id": int, "segmentation": (H, W) binary
    array OR uncompressed-RLE dict}. Returns (labels (T,) int32,
    masks (T, H, W) float32, valid (T,) bool), truncated to
    `max_instances` in list order like detectron2's sampling cap.
    """
    T = max_instances
    labels = np.zeros((T,), np.int32)
    masks = np.zeros((T, height, width), np.float32)
    valid = np.zeros((T,), bool)
    for i, ann in enumerate(annotations[:T]):
        seg = ann["segmentation"]
        if isinstance(seg, dict):
            m = rle_decode(seg["counts"], seg["size"])
        else:
            m = np.asarray(seg)
        assert m.shape == (height, width), (m.shape, (height, width))
        cid = int(ann["category_id"])
        labels[i] = cat_index[cid] if cat_index is not None else cid
        masks[i] = m.astype(np.float32)
        valid[i] = True
    return labels, masks, valid


def collate_targets(per_image: Sequence[tuple]):
    """Stack per-image (labels, masks, valid) triples into batch arrays."""
    labels = jnp.asarray(np.stack([t[0] for t in per_image]))
    masks = jnp.asarray(np.stack([t[1] for t in per_image]))
    valid = jnp.asarray(np.stack([t[2] for t in per_image]))
    return labels, masks, valid


def make_seg_finetune_step(model: Mask2Former,
                           tx: optax.GradientTransformation,
                           criterion_cfg: CriterionConfig | None = None
                           ) -> Callable:
    """`step(variables, opt_state, images, labels, masks, valid, key) ->
    (variables, opt_state, metrics)` — one fine-tuning update
    (`maskformer_model.py:198-216` training path + optimizer)."""

    def step(variables, opt_state, images: Array, labels: Array,
             masks: Array, valid: Array, key: Array):
        def total(v):
            t, losses = mask2former_train_loss(
                model, v, images, labels, masks, valid, key,
                criterion_cfg=criterion_cfg)
            return t, losses

        (loss, losses), grads = jax.value_and_grad(total, has_aux=True)(
            variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        metrics = {"loss": loss, "loss_ce": losses["loss_ce"],
                   "loss_mask": losses["loss_mask"],
                   "loss_dice": losses["loss_dice"]}
        return variables, opt_state, metrics

    return step
