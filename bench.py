"""Benchmark: MAL training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Measures the full jit-compiled ManyDepth+MAL training step (teacher + student
forward, cost volume, photometric warps, MAL distillation, Adam update) at the
reference configuration — 192x640, batch 12, 96 depth bins
(`manydepth/options.py:50-109`) — on synthetic data, steady state (compile
excluded). The headline number uses the TPU fast-training mode (bf16 conv
trunks + bf16 MXU cost-volume, `mal_tpu.config.TRAIN_FAST_SETTINGS` — the
`cli train` default); `fp32_fps` is the exact-parity mode, and
`temporal_fps` runs the step with the MAL temporal hint enabled (3 frozen
Mask2Former Swin-L forwards per step, `manydepth/trainer.py:1161-1165`).

`vs_baseline`: the reference publishes no numbers (BASELINE.md). The
denominator is DERIVED at runtime: `benchmarks/baseline_ref.py` measured the
reference's own torch step and the mal_tpu step at the SAME speed on this
host's CPU (33.06 vs 32.91 s/step — framework ratio 1.004), and both are
bandwidth-bound (benchmarks/PROFILE.md), so the reference's A100 throughput
is estimated as our measured v5e fp32 fps x (A100-80GB HBM 2039 GB/s /
v5e 819 GB/s) x 1.004. `v5p_projected_fps` applies the v5p/v5e bandwidth
ratio (2765/819) to the headline for the >=4x-on-v5p north star. Full
arithmetic: BASELINE.md "Derived throughput baseline".
"""

from __future__ import annotations

import json
import os
import time

import jax

# persist compiled executables across runs (tests/conftest.py does the same
# for pytest; without this every bench run pays full remote recompilation)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

# public vendor HBM bandwidths (GB/s) + the measured same-silicon framework
# ratio from benchmarks/baseline_ref.py — see module docstring / BASELINE.md
A100_BW, V5E_BW, V5P_BW = 2039.0, 819.0, 2765.0
TORCH_OVER_JAX_SAME_SILICON = 33.06 / 32.91  # 1.004, measured round 3


def _measure(cfg, seg_fn=None, seg_variables=None, n_iters: int = 10) -> float:
    """Steady-state frames/s for one training-step configuration."""
    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.models import MALModel
    from mal_tpu.train.state import create_train_state, make_optimizer
    from mal_tpu.train.step import make_train_step

    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng)
    if cfg.seg_cache_root is not None and (cfg.temporal or cfg.main_temporal):
        # cached-instance fast path (`segment/cache.py`): the current-frame
        # instances arrive as batch arrays instead of a segmenter forward
        inst = seg_fn(seg_variables, batch["color"]["0"])
        batch = dict(batch, seg_masks=inst.masks, seg_classes=inst.classes,
                     seg_scores=inst.scores, seg_valid=inst.valid)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx, seg_fn=seg_fn),
                   donate_argnums=(0,))
    extras = (seg_variables,) if seg_fn is not None else ()

    epoch = jnp.zeros(())
    # warmup / compile; device_get forces execution even over remote-attached
    # devices (block_until_ready alone does not flush the axon tunnel)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), epoch, *extras)
    loss = float(jax.device_get(metrics["loss"]))
    assert jnp.isfinite(loss), f"training diverged: loss={loss}"

    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i), epoch,
                              *extras)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n_iters
    return cfg.batch_size / dt


def _temporal_seg_fn(cfg):
    """Frozen Mask2Former seg_fn + weights (random weights — the compute
    cost is weight-independent; real weights via convert_mask2former_pkl)."""
    from mal_tpu.segment.mask2former import (
        Mask2Former, make_seg_fn, resolve_fused_swin)

    model = Mask2Former(max_instances=cfg.max_instances,
                        bf16_backbone=cfg.compute_dtype == "bfloat16",
                        fused_swin=resolve_fused_swin(cfg))
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.height, cfg.width, 3)))
    return make_seg_fn(model, None, cfg.max_instances), variables


def _derived_temporal_fps(cfg, fps_base: float) -> float:
    """Temporal-hint throughput derived as base step + 3x Mask2Former
    forward (the reference's headline `--temporal` config: one
    image_synthesis call segmenting the current + two warped frames,
    `manydepth/trainer.py:1161-1162`, `dyn_utils.py:125,148`), measured
    separately. Used when the combined step program exceeds the
    remote-compile upload limit."""
    from mal_tpu.segment.mask2former import (
        Mask2Former, make_seg_fn, resolve_fused_swin)

    model = Mask2Former(max_instances=cfg.max_instances,
                        bf16_backbone=cfg.compute_dtype == "bfloat16",
                        fused_swin=resolve_fused_swin(cfg))
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, cfg.height, cfg.width, 3)))
    seg_fn = jax.jit(make_seg_fn(model, None, cfg.max_instances))

    imgs = jnp.zeros((cfg.batch_size, cfg.height, cfg.width, 3))
    inst = seg_fn(variables, imgs)
    float(jax.device_get(inst.scores[0, 0]))
    t0 = time.perf_counter()
    for _ in range(5):
        inst = seg_fn(variables, imgs)
    float(jax.device_get(inst.scores[0, 0]))
    t_seg = (time.perf_counter() - t0) / 5

    t_step = cfg.batch_size / fps_base
    return cfg.batch_size / (t_step + 3.0 * t_seg)


def main():
    from mal_tpu.config import TRAIN_FAST_SETTINGS, Config

    base = Config(height=192, width=640, batch_size=12)
    fast = base.replace(**TRAIN_FAST_SETTINGS)

    fps_fast = _measure(fast)
    fps_fp32 = _measure(base)

    temporal_fps = None
    temporal_derived = False
    try:
        # the reference's headline MAL training command enables --temporal
        # only (`/root/reference/README.md:22,25`: `--loss_blc --distil
        # --temporal`); --main_temporal is an ablation flag it never
        # headlines, so the temporal bench matches the published command
        # (3 segmenter forwards/step: current + the two warped frames)
        tcfg = fast.replace(temporal=True, main_temporal=False)
        seg_fn, seg_vars = _temporal_seg_fn(tcfg)
        temporal_fps = _measure(tcfg, seg_fn=seg_fn, seg_variables=seg_vars,
                                n_iters=5)
    except Exception as e:  # temporal bench must not sink the headline
        print(f"# temporal step bench fell back to derived: "
              f"{type(e).__name__}: {e}")
        try:
            temporal_fps = _derived_temporal_fps(fast, fps_fast)
            temporal_derived = True
        except Exception as e2:
            print(f"# temporal bench skipped: {type(e2).__name__}: {e2}")

    temporal_cached_fps = None
    if temporal_fps is not None and not temporal_derived:
        try:
            # precomputed-instance fast path (`cli export-seg` +
            # `seg_cache_root`): the current-frame forward comes from disk,
            # leaving two segmenter forwards (the warped frames) per step
            ccfg = fast.replace(temporal=True, main_temporal=False,
                                seg_cache_root="bench-stub")
            temporal_cached_fps = _measure(ccfg, seg_fn=seg_fn,
                                           seg_variables=seg_vars, n_iters=5)
        except Exception as e:
            print(f"# cached temporal bench skipped: "
                  f"{type(e).__name__}: {e}")

    # derived reference-A100 estimate (BASELINE.md): bandwidth-bound step,
    # measured same-silicon framework parity
    ref_a100_est = fps_fp32 * (A100_BW / V5E_BW) * TORCH_OVER_JAX_SAME_SILICON
    out = {
        "metric": "train_frames_per_sec_per_chip_640x192",
        "value": round(fps_fast, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_fast / ref_a100_est, 3),
        "fp32_fps": round(fps_fp32, 2),
        "ref_a100_est_fps": round(ref_a100_est, 1),
        "v5p_projected_fps": round(fps_fast * (V5P_BW / V5E_BW), 1),
    }
    if temporal_fps is not None:
        key = "temporal_fps_derived" if temporal_derived else "temporal_fps"
        out[key] = round(temporal_fps, 2)
    if temporal_cached_fps is not None:
        out["temporal_cached_fps"] = round(temporal_cached_fps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
