"""mal_tpu: TPU-native framework for motion-aware self-supervised multi-frame
monocular depth estimation (MAL).

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
PyTorch codebase (YuejiangDong/MAL): ManyDepth-style cost-volume depth,
DynamicDepth occlusion-aware variant, DualRefine equilibrium refinement, and
the MAL temporal / distillation hints — built TPU-first:

- NHWC layouts, static shapes, bf16-friendly compute on the MXU.
- One geometry/ops library shared by every model family (the reference keeps
  four near-identical copies; see SURVEY.md §1).
- Functional training steps (`jit`-compiled), explicit PRNG threading.
- Data parallelism via `jax.sharding.Mesh` + `shard_map`, gradient `psum`,
  `pmin`/`pmax` collectives for the adaptive depth-bin tracker (replacing the
  reference's Accelerate/DDP/NCCL stack, `manydepth/trainer.py:309-311`).
"""

__version__ = "0.1.0"

from mal_tpu import geometry, losses  # noqa: F401
from mal_tpu.config import Config, PRESETS  # noqa: F401

# Subpackage map (lazy imports to keep `import mal_tpu` light):
#   mal_tpu.models    — ManyDepth+MAL networks (MALModel flagship)
#   mal_tpu.dynamic   — DynamicDepth configuration (DOMD, occlusion CV)
#   mal_tpu.dualref   — DualRefine configuration (DEQ refinement)
#   mal_tpu.segment   — Mask2Former front-end + instance matching
#   mal_tpu.temporal  — MAL temporal hint (dynamic-object synthesis)
#   mal_tpu.train     — jit train steps, TrainState, host Trainer
#   mal_tpu.parallel  — device mesh / data parallelism
#   mal_tpu.ops       — grid_sample, SSIM, cost volume (+ Pallas kernels)
#   mal_tpu.data      — KITTI/CityScapes/DDAD loaders, native IO runtime
#   mal_tpu.eval      — reference evaluation protocol + metrics
#   mal_tpu.convert   — reference .pth checkpoint converters
