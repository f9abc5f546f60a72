"""Precomputed segmenter-instance cache for the MAL temporal hint.

The reference re-runs the frozen Mask2Former on every CURRENT frame of
every batch, every epoch (`manydepth/dyn_utils.py:125` inside
`image_synthesis`, called from `trainer.py:1161`), even though the
segmenter is frozen — the current-frame instances are a pure function of
the dataset image and can be computed once per dataset. This module is the
tooling the reference lacks: export the per-frame `Instances` once
(`cli export-seg`), then train with `Config.seg_cache_root` set and the
step loads them from the batch instead of spending a Swin-L forward
(one of the three segmenter forwards per `--temporal` step; the other two
run on warped images that depend on the live depth/pose predictions and
cannot be cached).

The cached representation is lossless: `instance_inference` emits binary
float masks (`segment/mask2former.py:105`), which bit-pack exactly
(`np.packbits`); classes/valid are integral and scores are stored fp32 as
computed at export (an online forward at a different batch shape can
differ at the fp32 LSB through XLA fusion — scores are consumed through
the 0.9 `ins_threshold` comparison only). Because training flips frames
with p=0.5 (`data/mono_dataset.py:101`) and a real segmenter is not
flip-equivariant, BOTH orientations are exported — the loader picks the
one matching the sample's `do_flip` draw.

Storage at 192x640, 8 slots: ~123 KB/frame/orientation bit-packed
(~10 GB for the 39,810-frame eigen_zhou split, both orientations).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["cache_path", "save_frame_instances", "load_frame_instances",
           "pack_masks", "unpack_masks", "export_split_instances",
           "instances_from_batch"]


def pack_masks(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) binary float/bool -> (N, H, ceil(W/8)) uint8, lossless."""
    return np.packbits(np.asarray(masks) > 0.5, axis=-1)


def unpack_masks(packed: np.ndarray, width: int) -> np.ndarray:
    """Inverse of `pack_masks` -> (N, H, W) float32 binary."""
    bits = np.unpackbits(packed, axis=-1, count=width)
    return bits.astype(np.float32)


def cache_path(root: str, folder: str, frame_index: int, side,
               do_flip: bool) -> str:
    """One .npz per (frame, orientation); `folder` slashes flatten so the
    cache is a single directory (fast existence checks, rsync-friendly)."""
    key = folder.replace("/", "__").replace(os.sep, "__")
    side_s = side if side is not None else "x"
    flip_s = "_f" if do_flip else ""
    return os.path.join(root, f"{key}__{int(frame_index):010d}_{side_s}"
                              f"{flip_s}.npz")


def save_frame_instances(path: str, masks: np.ndarray, classes: np.ndarray,
                         scores: np.ndarray, valid: np.ndarray) -> None:
    np.savez_compressed(
        path,
        masks_bits=pack_masks(masks),
        width=np.int32(masks.shape[-1]),
        classes=np.asarray(classes, np.int32),
        scores=np.asarray(scores, np.float32),
        valid=np.asarray(valid, bool))


def load_frame_instances(path: str) -> dict:
    """-> dict of per-frame arrays in the batch key layout (`seg_*`)."""
    with np.load(path) as z:
        return {
            "seg_masks": unpack_masks(z["masks_bits"], int(z["width"])),
            "seg_classes": z["classes"],
            "seg_scores": z["scores"],
            "seg_valid": z["valid"],
        }


def instances_from_batch(batch: dict):
    """Collated `seg_*` arrays -> `Instances` (the cached stand-in for
    `seg_fn(seg_variables, batch["color"]["0"])` in the train step)."""
    from mal_tpu.segment.instances import Instances

    return Instances(masks=batch["seg_masks"],
                     classes=batch["seg_classes"],
                     scores=batch["seg_scores"],
                     valid=batch["seg_valid"])


def export_split_instances(dataset, seg_fn, seg_variables, out_root: str,
                           batch_size: int = 12, log_every: int = 50,
                           print_fn=print) -> int:
    """Run the frozen segmenter over every sample's CURRENT frame in
    `dataset` (both orientations) and write the per-frame cache.

    `dataset` is a `MonoDataset` subclass: `index_to_folder_and_frame_idx`
    names the frame and `get_color(..., do_flip)` reproduces the exact
    training-time image (same PIL decode + ANTIALIAS resize as
    `__getitem__`, `data/mono_dataset.py:106-126`). Frames already cached
    are skipped, so the export is resumable. Returns the number of frames
    written.
    """
    import jax
    import jax.numpy as jnp

    os.makedirs(out_root, exist_ok=True)

    # unique (folder, frame_index, side): split files can repeat frames
    entries = []
    seen = set()
    for i in range(len(dataset)):
        folder, frame_index, side = dataset.index_to_folder_and_frame_idx(i)
        key = (folder, frame_index, side)
        if key not in seen:
            seen.add(key)
            entries.append(key)

    todo = []
    for folder, frame_index, side in entries:
        for flip in (False, True):
            path = cache_path(out_root, folder, frame_index, side, flip)
            if not os.path.exists(path):
                todo.append((folder, frame_index, side, flip, path))

    written = 0
    for start in range(0, len(todo), batch_size):
        chunk = todo[start:start + batch_size]
        from mal_tpu.data.mono_dataset import _ANTIALIAS

        imgs = []
        for folder, frame_index, side, flip, _ in chunk:
            img = dataset.get_color(folder, frame_index, side, flip)
            img = img.resize((dataset.width, dataset.height), _ANTIALIAS)
            imgs.append(np.asarray(img, np.float32) / 255.0)
        # static batch shape: pad the tail chunk so one jit program serves
        # the whole export
        n = len(imgs)
        while len(imgs) < batch_size:
            imgs.append(np.zeros_like(imgs[0]))
        inst = seg_fn(seg_variables, jnp.asarray(np.stack(imgs)))
        inst = jax.device_get(inst)
        for j, (_, _, _, _, path) in enumerate(chunk[:n]):
            save_frame_instances(path, inst.masks[j], inst.classes[j],
                                 inst.scores[j], inst.valid[j])
            written += 1
        if log_every and (start // batch_size) % log_every == 0:
            print_fn(f"export-seg: {min(start + batch_size, len(todo))}"
                     f"/{len(todo)} frames")
    return written
