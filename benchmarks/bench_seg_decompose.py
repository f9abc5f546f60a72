"""seg_fn stage decomposition on the real chip (composed prefixes).

Splits the production temporal-hint segmenter forward (bf16 backbone,
192x640, batch 12) into composed prefixes — backbone, + pixel decoder,
+ transformer decoder, + instance inference — each timed as ONE jit so
layouts match production (per-call dispatch over the axon tunnel has a
~10 ms floor; see benchmarks/PROFILE.md "Measurement methodology").
Prefix diffs give the per-component cost, steering which component gets
the next Pallas/fusion treatment.

Usage: python benchmarks/bench_seg_decompose.py [--fused]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import flax.linen as nn
import jax.numpy as jnp

from mal_tpu.segment.mask2former import (Mask2Former, instance_inference,
                                         preprocess_images)
from mal_tpu.segment.pixel_decoder import MSDeformAttnPixelDecoder
from mal_tpu.segment.swin import SwinTransformer
from mal_tpu.segment.transformer_decoder import MaskedTransformerDecoder

B, H, W = 12, 192, 640
FUSED = "--fused" in sys.argv[1:]


class _Prefix(nn.Module):
    """First `upto` components of the Mask2Former forward, mirroring the
    module names so Mask2Former variables load directly."""
    upto: int  # 1 backbone, 2 +pixel decoder, 3 +predictor, 4 +inference

    @nn.compact
    def __call__(self, images):
        x = preprocess_images(images, True)
        feats = SwinTransformer("large", bf16_compute=True,
                                fused_block=FUSED,
                                name="backbone")(x)
        if self.upto == 1:
            return feats["res5"]
        mask_features, multi_scale = MSDeformAttnPixelDecoder(
            bf16_compute=True, name="pixel_decoder")(feats)
        if self.upto == 2:
            return mask_features
        logits, masks = MaskedTransformerDecoder(
            num_classes=80, num_queries=100,
            name="predictor")(multi_scale, mask_features)
        if self.upto == 3:
            return masks
        return instance_inference(logits, masks, H, W, 8)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 3),
                              jnp.float32)
    variables = jax.jit(Mask2Former(bf16_backbone=True).init)(
        jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))

    names = {1: "backbone", 2: "+pixel_decoder", 3: "+predictor",
             4: "+instance_inference"}
    prev = 0.0
    print(f"fused_swin={FUSED}")
    for upto in (1, 2, 3, 4):
        f = jax.jit(lambda v, x, m=_Prefix(upto): m.apply(v, x))
        t = timeit(f, variables, imgs)
        print(f"{names[upto]:22s}: {t:7.1f} ms  (delta {t - prev:+7.1f})")
        prev = t


if __name__ == "__main__":
    main()
