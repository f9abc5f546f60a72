"""Visualization helpers (`manydepth/utils.py`, `trainer.py:1732-1759`,
`manydepth/layers.py:281-297`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def colormap_plasma(x: np.ndarray, vmin=None, vmax=None) -> np.ndarray:
    """(H, W) -> (H, W, 3) uint8 plasma colormap (matplotlib-free)."""
    # 16-anchor plasma approximation, linearly interpolated
    anchors = np.array([
        [13, 8, 135], [62, 4, 156], [99, 0, 167], [132, 5, 167],
        [162, 23, 158], [187, 44, 141], [209, 66, 124], [227, 89, 107],
        [241, 113, 92], [250, 139, 77], [254, 167, 62], [252, 196, 49],
        [243, 227, 41], [240, 249, 33], [240, 249, 33], [240, 249, 33],
    ], np.float32)
    vmin = float(x.min()) if vmin is None else vmin
    vmax = float(x.max()) if vmax is None else vmax
    t = np.clip((x - vmin) / max(vmax - vmin, 1e-9), 0, 1) * (len(anchors) - 1)
    lo = np.floor(t).astype(np.int32)
    hi = np.minimum(lo + 1, len(anchors) - 1)
    frac = (t - lo)[..., None]
    rgb = anchors[lo] * (1 - frac) + anchors[hi] * frac
    return rgb.astype(np.uint8)


def dump_disp_images(disps, out_dir: str, step: int, n: int = 4,
                     to_wandb: bool = True) -> list[str]:
    """Write the first `n` disparity maps as plasma-colormapped PNGs.

    The reference's (dormant) TensorBoard image path logs
    `colormap(outputs["disp", s])` per frame (`manydepth/trainer.py:
    1533-1585`, `:1732-1759` colormap); here the sink is
    `{out_dir}/step_{step}_disp_{i}.png` — plus `wandb.log` images when a
    wandb run is active (the reference's live sink is wandb scalars only).
    Normalization is per-image to the 95th percentile like the reference's
    `normalize_image`/vmax convention for disparity. Returns written paths.
    """
    import os

    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, d in enumerate(disps[:n]):
        d = np.asarray(d, np.float32)
        if d.ndim == 3:  # (H, W, 1)
            d = d[..., 0]
        rgb = colormap_plasma(d, vmin=0.0, vmax=float(np.percentile(d, 95)))
        p = os.path.join(out_dir, f"step_{step}_disp_{i}.png")
        Image.fromarray(rgb).save(p)
        paths.append(p)
    if to_wandb and paths:
        try:
            import wandb

            if wandb.run is not None:
                wandb.log({"val/disp": [wandb.Image(p) for p in paths]},
                          step=step)
        except ImportError:
            pass
    return paths


def sobel(img: Array) -> Array:
    """Sobel x/y gradients of a single-channel image (B, H, W, 1) -> (B, H-2, W-2, 2).

    Kernel weights match `manydepth/layers.py:281-297` (2/4-weighted, VALID)."""
    gx = jnp.asarray([[2, 0, -2], [4, 0, -4], [2, 0, -2]], img.dtype)
    gy = jnp.asarray([[2, 4, 2], [0, 0, 0], [-2, -4, -2]], img.dtype)
    k = jnp.stack([gx, gy], axis=-1)[:, :, None, :]  # (3,3,1,2)
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def normalize_image(x: Array) -> Array:
    """Rescale to [0, 1] per image (tensorboard helper, `trainer.py:1752-1759`)."""
    mn = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    mx = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return (x - mn) / (mx - mn + 1e-9)
