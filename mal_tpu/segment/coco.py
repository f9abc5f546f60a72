"""COCO-format instance dataset for segmenter fine-tuning.

Replaces the reference's detectron2 dataset registration + mapper chain
(`mask2former/data/` — `register_coco_instances`,
`MaskFormerInstanceDatasetMapper`) with a self-contained reader: a COCO
json (`images` / `annotations` / `categories`) plus an image directory,
yielding normalized RGB images and the padded static targets of
`segment/criterion.py`.

Segmentation formats supported: uncompressed RLE dicts and polygon lists
(rasterized with matplotlib's point-in-path test — matplotlib is already a
dependency of the reference stack). Compressed (pycocotools string) RLE is
not supported in this environment and raises with that explanation.
"""

from __future__ import annotations

import json
import os

import numpy as np

from mal_tpu.segment.finetune import (category_index, coco_to_targets,
                                      rle_decode)


def polygon_to_mask(polygons, height: int, width: int) -> np.ndarray:
    """COCO polygon list [[x0, y0, x1, y1, ...], ...] -> (H, W) uint8.

    Matches pycocotools' even-odd fill over the union of polygon parts,
    with pixel centers as the sample points."""
    from matplotlib.path import Path

    ys, xs = np.mgrid[0:height, 0:width]
    pts = np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=-1)
    mask = np.zeros(height * width, bool)
    for poly in polygons:
        xy = np.asarray(poly, np.float64).reshape(-1, 2)
        mask |= Path(xy).contains_points(pts)
    return mask.reshape(height, width).astype(np.uint8)


def _decode_segmentation(seg, height: int, width: int) -> np.ndarray:
    if isinstance(seg, dict):
        counts = seg["counts"]
        if isinstance(counts, (str, bytes)):
            raise NotImplementedError(
                "compressed COCO RLE needs pycocotools (absent here); "
                "export uncompressed RLE or polygons")
        m = rle_decode(counts, seg["size"])
        assert m.shape == (height, width)
        return m
    return polygon_to_mask(seg, height, width)


class CocoInstanceDataset:
    """items: (image (H, W, 3) float32 in [0,1], labels, masks, valid)."""

    def __init__(self, json_path: str, image_root: str, height: int,
                 width: int, max_instances: int = 16):
        with open(json_path) as f:
            coco = json.load(f)
        self.height, self.width = height, width
        self.max_instances = max_instances
        self.cat_index = category_index(
            [c["id"] for c in coco["categories"]])
        self.num_classes = len(self.cat_index)
        self.image_root = image_root
        self.images = coco["images"]
        self.anns_by_image: dict[int, list] = {}
        for a in coco["annotations"]:
            self.anns_by_image.setdefault(int(a["image_id"]), []).append(a)

    def __len__(self):
        return len(self.images)

    def _resize_nn(self, arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape[:2]
        ys = np.floor(np.arange(self.height) * (h / self.height)).astype(int)
        xs = np.floor(np.arange(self.width) * (w / self.width)).astype(int)
        return arr[ys][:, xs]

    def __getitem__(self, i: int):
        from PIL import Image

        info = self.images[i]
        img = Image.open(os.path.join(self.image_root,
                                      info["file_name"])).convert("RGB")
        ih, iw = int(info["height"]), int(info["width"])
        image = (np.asarray(
            img.resize((self.width, self.height), Image.LANCZOS),
            np.float32) / 255.0)

        anns = []
        for a in self.anns_by_image.get(int(info["id"]), []):
            m = _decode_segmentation(a["segmentation"], ih, iw)
            anns.append({"category_id": a["category_id"],
                         "segmentation": self._resize_nn(m)})
        return (image,) + coco_to_targets(
            anns, self.height, self.width, self.max_instances,
            cat_index=self.cat_index)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0):
        import jax.numpy as jnp

        order = np.arange(len(self))
        if shuffle:
            np.random.RandomState(seed).shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[s:s + batch_size]]
            yield (jnp.asarray(np.stack([it[0] for it in items])),
                   jnp.asarray(np.stack([it[1] for it in items])),
                   jnp.asarray(np.stack([it[2] for it in items])),
                   jnp.asarray(np.stack([it[3] for it in items])))
