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
import subprocess
import sys
import time

import jax

# persist compiled executables across runs (tests/conftest.py does the same
# for pytest; without this every bench run pays full remote recompilation)
_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

# public vendor HBM bandwidths (GB/s) + the measured same-silicon framework
# ratio from benchmarks/baseline_ref.py — see module docstring / BASELINE.md
A100_BW, V5E_BW, V5P_BW = 2039.0, 819.0, 2765.0
V5E_PEAK_BF16 = 197e12  # flop/s, vendor peak
TORCH_OVER_JAX_SAME_SILICON = 33.06 / 32.91  # 1.004, measured round 3

# ---------------------------------------------------------------------------
# Robustness harness (parent/child). The axon TPU tunnel can go down or
# STALL mid-run (a hung device op blocks the main thread inside a C call
# where Python signals are never processed — round 3's end-of-round bench
# died rc=124 with zero output that way; the stall mode is documented in
# .claude/skills/verify/SKILL.md). Architecture:
#   * parent (never touches jax, so it can't hang): spawns a child that
#     does the measuring, watches the child's result file for progress,
#     kills it on stall (no phase completed for MAL_BENCH_STALL_S) or
#     budget exhaustion (MAL_BENCH_BUDGET_S), retries once if budget
#     allows, and ALWAYS prints the one JSON line — on SIGTERM from the
#     driver's `timeout` too (handler: kill child, emit, exit).
#   * child (`bench.py --child <file>`): runs the measurement phases in
#     order, rewriting <file> after EACH phase, skipping phases whose keys
#     are already in <file> (so a retry resumes, not restarts).
#   * if nothing was measured at all, the last committed good run is
#     emitted, explicitly labeled "stale" — never presented as fresh.
# ---------------------------------------------------------------------------
_BUDGET_S = float(os.environ.get("MAL_BENCH_BUDGET_S", "1500"))
_STALL_S = float(os.environ.get("MAL_BENCH_STALL_S", "600"))
_T0 = time.monotonic()
_LAST_GOOD = os.path.join(_HERE, "benchmarks", "last_bench.json")


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _read_json(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _emit(result: dict, note: str | None = None) -> None:
    """Print the ONE JSON line from whatever has been measured. If nothing
    fresh was measured, the primary keys are null — a value-only parser can
    never mistake a stale run for a fresh one — and the last committed good
    run rides along under the separate `last_good` key (ADVICE r4)."""
    out = dict(result)
    out.pop("_phase_done_at", None)
    if "value" not in out:
        out = {"metric": "train_frames_per_sec_per_chip_640x192",
               "value": None, "unit": "frames/s", "vs_baseline": None,
               "error": note or "no fresh measurement"}
        last = _read_json(_LAST_GOOD)
        if "value" in last:
            out["last_good"] = last
    elif note:
        out["partial"] = note
    print(json.dumps(out), flush=True)


def _probe_tpu() -> bool:
    """True if a real device op completes in a killable subprocess.
    `jax.devices()` can succeed while ops hang (observed tunnel-outage
    mode), so the probe must run an actual computation."""
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((256, 256)); (x @ x).block_until_ready(); "
            "print('PROBE_OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=180, cwd=_HERE)
        return "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


_PHASE_KEYS = ("value", "fp32_fps", "temporal_fps", "temporal_cached_fps")


def _parent() -> None:
    import signal
    import tempfile

    fd, path = tempfile.mkstemp(prefix="mal_bench_", suffix=".json")
    os.close(fd)
    _write_json(path, {})
    child: subprocess.Popen | None = None

    def _finish(note=None):
        if child is not None and child.poll() is None:
            child.kill()
        result = _read_json(path)
        # a COMPLETE run refreshes the committed last-good snapshot used
        # as the labeled-stale fallback
        if all(k in result for k in _PHASE_KEYS):
            result.pop("_phase_done_at", None)
            try:
                _write_json(_LAST_GOOD, dict(result, measured_at=time.strftime(
                    "%Y-%m-%d %H:%M UTC", time.gmtime())))
            except OSError:
                pass
        _emit(result, note)
        try:
            os.unlink(path)
        except OSError:
            pass

    def _on_term(signum, frame):
        _finish(f"killed by signal {signum} before all phases finished")
        raise SystemExit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # tunnel-down case: probe with retries while the budget allows
    # (transient outages come back in minutes)
    while not _probe_tpu():
        if _remaining() < 300.0:
            _finish("TPU unreachable at bench time (probe op never "
                    "completed)")
            return
        print("# TPU probe failed; retrying in 60s "
              f"(budget left {_remaining():.0f}s)", flush=True)
        time.sleep(60.0)

    attempts = 0
    while _remaining() > 120.0 and attempts < 3:
        attempts += 1
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", path],
            cwd=_HERE)
        last_progress = time.monotonic()
        n_done = sum(k in _read_json(path) for k in _PHASE_KEYS)
        while child.poll() is None:
            time.sleep(5.0)
            now_done = sum(k in _read_json(path) for k in _PHASE_KEYS)
            if now_done > n_done:
                n_done, last_progress = now_done, time.monotonic()
            if (time.monotonic() - last_progress > _STALL_S
                    or _remaining() < 30.0):
                child.kill()
                child.wait()
                print(f"# bench child killed (stall/budget), "
                      f"{n_done} phases done", flush=True)
                break
        if child.poll() is not None and child.returncode == 0:
            break  # child finished all phases it attempted
        if _remaining() < 300.0:
            break
        print(f"# retrying bench child (attempt {attempts + 1}), resuming "
              f"after {n_done} phases", flush=True)
    _finish()


def _cost_stats(compiled) -> dict:
    """XLA's own cost model over the OPTIMIZED (post-fusion) HLO of the
    compiled step: total flops + bytes accessed. Bytes are XLA's HBM-traffic
    proxy (each fused op's operands+outputs counted once); it slightly
    overcounts true DMA traffic for VMEM-resident reuse but is the best
    machine-readable roofline denominator available. Best-effort: {} if the
    backend doesn't expose cost analysis."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out = {}
        if ca.get("flops", 0) > 0:
            out["flops"] = float(ca["flops"])
        if ca.get("bytes accessed", 0) > 0:
            out["bytes"] = float(ca["bytes accessed"])
        return out
    except Exception as e:
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}")
        return {}


def _measure(cfg, seg_fn=None, seg_variables=None, n_iters: int = 10,
             cost_out: dict | None = None) -> float:
    """Steady-state frames/s for one training-step configuration.

    With `cost_out`, also records the roofline numbers for the step: XLA
    cost-model flops/bytes (see _cost_stats) + the achieved GB/s and MFU
    computed from the measured step time against the v5e peaks
    (819 GB/s HBM, 197 Tflop/s bf16)."""
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
    jitted = jax.jit(make_train_step(cfg, model, tx, seg_fn=seg_fn),
                     donate_argnums=(0,))
    extras = (seg_variables,) if seg_fn is not None else ()

    epoch = jnp.zeros(())
    if cost_out is not None:
        # AOT: one trace + one compile serves both the cost analysis and
        # the measurement loop (a second jit trace of the full step costs
        # minutes on this host and tripped the stall watchdog)
        step = jitted.lower(state, batch, jax.random.PRNGKey(1), epoch,
                            *extras).compile()
        cost_out.update(_cost_stats(step))
    else:
        step = jitted
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
    if cost_out is not None:
        cost_out["step_ms"] = round(dt * 1e3, 2)
        if "bytes" in cost_out:
            cost_out["achieved_gbps"] = round(cost_out["bytes"] / dt / 1e9, 1)
            cost_out["hbm_frac"] = round(
                cost_out["achieved_gbps"] / V5E_BW, 3)
        if "flops" in cost_out:
            cost_out["mfu"] = round(
                cost_out["flops"] / dt / V5E_PEAK_BF16, 4)
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


def _child(path: str) -> None:
    """Measurement phases in order, rewriting `path` after each (a parent
    retry resumes from the phases already present)."""
    from mal_tpu.config import TRAIN_FAST_SETTINGS, Config

    res = _read_json(path)
    base = Config(height=192, width=640, batch_size=12)
    fast = base.replace(**TRAIN_FAST_SETTINGS)

    if "value" not in res:
        cost: dict = {}
        fps_fast = _measure(fast, cost_out=cost)
        res.update({
            "metric": "train_frames_per_sec_per_chip_640x192",
            "value": round(fps_fast, 2), "unit": "frames/s",
            "vs_baseline": None,
            "v5p_projected_fps": round(fps_fast * (V5P_BW / V5E_BW), 1)})
        # roofline accounting for the headline step (VERDICT r4): quantifies
        # the "memory-bound" claim — bytes/flops from XLA's post-fusion cost
        # model, GB/s + MFU from the measured step time vs v5e peaks
        if "bytes" in cost:
            res["bytes_per_step_gb"] = round(cost["bytes"] / 1e9, 2)
        if "flops" in cost:
            res["tflops_per_step"] = round(cost["flops"] / 1e12, 2)
        for k in ("achieved_gbps", "hbm_frac", "mfu"):
            if k in cost:
                res[k] = cost[k]
        _write_json(path, res)
    fps_fast = res["value"]

    if "fp32_fps" not in res:
        fps_fp32 = _measure(base)
        # derived reference-A100 estimate (BASELINE.md): bandwidth-bound
        # step, measured same-silicon framework parity
        ref = fps_fp32 * (A100_BW / V5E_BW) * TORCH_OVER_JAX_SAME_SILICON
        res.update({"fp32_fps": round(fps_fp32, 2),
                    "ref_a100_est_fps": round(ref, 1),
                    "vs_baseline": round(fps_fast / ref, 3)})
        _write_json(path, res)

    need_temporal = ("temporal_fps" not in res
                     and "temporal_fps_derived" not in res)
    need_cached = ("temporal_fps" in res
                   and "temporal_cached_fps" not in res) or need_temporal
    if not (need_temporal or need_cached):
        return
    # the reference's headline MAL training command enables --temporal
    # only (`/root/reference/README.md:22,25`: `--loss_blc --distil
    # --temporal`); --main_temporal is an ablation flag it never
    # headlines, so the temporal bench matches the published command
    # (3 segmenter forwards/step: current + the two warped frames)
    tcfg = fast.replace(temporal=True, main_temporal=False)
    seg_fn = seg_vars = None
    failed = False
    if need_temporal:
        try:
            seg_fn, seg_vars = _temporal_seg_fn(tcfg)
            t = _measure(tcfg, seg_fn=seg_fn, seg_variables=seg_vars,
                         n_iters=5)
            res["temporal_fps"] = round(t, 2)
        except Exception as e:  # must not sink the headline
            print(f"# temporal step bench fell back to derived: "
                  f"{type(e).__name__}: {e}")
            failed = True
            try:
                res["temporal_fps_derived"] = round(
                    _derived_temporal_fps(fast, fps_fast), 2)
            except Exception as e2:
                print(f"# temporal bench skipped: {type(e2).__name__}: {e2}")
        _write_json(path, res)
    if "temporal_fps" in res and "temporal_cached_fps" not in res:
        try:
            if seg_fn is None:
                seg_fn, seg_vars = _temporal_seg_fn(tcfg)
            # precomputed-instance fast path (`cli export-seg` +
            # `seg_cache_root`): the current-frame forward comes from disk,
            # leaving two segmenter forwards (the warped frames) per step
            ccfg = tcfg.replace(seg_cache_root="bench-stub")
            c = _measure(ccfg, seg_fn=seg_fn, seg_variables=seg_vars,
                         n_iters=5)
            res["temporal_cached_fps"] = round(c, 2)
        except Exception as e:
            print(f"# cached temporal bench failed: "
                  f"{type(e).__name__}: {e}")
            failed = True
        _write_json(path, res)
    if failed:
        # exceptions here are usually transient tunnel/remote-compile
        # errors: exit nonzero so the parent retries the missing phases
        # (completed ones resume from the phase file)
        sys.exit(2)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2])
    else:
        _parent()
