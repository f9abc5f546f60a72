"""The jit-compiled MAL training step.

Functional re-design of `Trainer.process_batch` + `run_epoch`
(`manydepth/trainer.py:449-644`): one traced function
(state, batch, rng, epoch) -> (state, metrics) containing the teacher and
student forward passes, photometric warps, MAL distillation, loss balancing,
the Adam update, BN-stat updates, and the adaptive depth-bin EMA.

Under a data-sharded `jit` (see `mal_tpu.parallel`), every reduction in here
(loss means, gradient accumulation, the depth-bin batch statistics) becomes a
cross-chip collective inserted by XLA — the TPU-native equivalent of the
reference's Accelerate/DDP NCCL all-reduce + torchmetrics dist reductions.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from mal_tpu import geometry, losses
from mal_tpu.config import Config
from mal_tpu.ops.interp import grid_sample
from mal_tpu.train.state import TrainState

Array = jax.Array


def warp_frame(src: Array, depth: Array, T: Array, K: Array, inv_K: Array) -> Array:
    """Inverse-warp `src` into the current view given depth + pose.

    Reference: `manydepth/trainer.py:1111-1125` (border padding,
    align_corners=True).
    """
    B, H, W, _ = src.shape
    points = geometry.backproject(depth[..., 0], inv_K, H, W)
    grid = geometry.project_3d(points, K, T, H, W)
    return grid_sample(src, grid, padding_mode="border", align_corners=True)


def _photometric_warps(cfg: Config, batch, outputs, depth, detach_T: bool):
    """Warped adjacent frames for the photometric loss."""
    warped = []
    for f in cfg.frame_ids[1:]:
        T = outputs[f"cam_T_cam/0/{f}"]
        if detach_T:
            T = jax.lax.stop_gradient(T)
        warped.append(warp_frame(batch["color"][str(f)], depth, T,
                                 batch["K"], batch["inv_K"]))
    return warped


def _all_photometric_warps(cfg: Config, batch, outputs, depth_specs):
    """All photometric warps for the step; per-spec backprojection is shared.

    depth_specs: list of (depth, detach_T) — mono, multi, ensemble. NOTE:
    stacking all six (set x frame) warps into ONE (6B, H, W, 3) gather was
    measured 344 -> 524 ms/step on v5e (benchmarks/HISTORY.md) — the big
    gather tiles worse and the src/grid concats defeat XLA's fusion of the
    projection math into each gather — so the warps stay separate gathers
    with only the backprojected points shared per depth set.
    """
    B, H, W, _ = batch["color"]["0"].shape
    # bf16 fast mode: gather the image PAYLOAD in bf16 (halves the gathered
    # bytes; [0,1] pixels keep ~3 decimal digits) while every coordinate /
    # weight stays fp32 — bf16's 8 mantissa bits cannot address a 640-wide
    # image to sub-pixel precision.
    payload = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
               else jnp.float32)
    out = []
    for depth, detach in depth_specs:
        points = geometry.backproject(depth[..., 0], batch["inv_K"], H, W)
        warped = []
        for f in cfg.frame_ids[1:]:
            T = outputs[f"cam_T_cam/0/{f}"]
            if detach:
                T = jax.lax.stop_gradient(T)
            grid = geometry.project_3d(points, batch["K"], T, H, W)
            w = grid_sample(batch["color"][str(f)].astype(payload), grid,
                            padding_mode="border", align_corners=True)
            warped.append(w.astype(jnp.float32))
        out.append(warped)
    return out


def make_loss_fn(cfg: Config, model, seg_fn: Callable | None = None
                 ) -> Callable:
    """Build the pure MAL loss function.

    Returns `loss_fn(params, batch_stats, min_d, max_d, balancer, batch,
    rng_model, rng_noise, epoch, seg_variables=None) -> (total, aux)` — the
    full loss assembly of `Trainer.process_batch` (`manydepth/trainer.py:
    555-644`) as a gradable function. `make_train_step` wraps it with
    jax.grad + the optimizer/bins/balancer state plumbing; the reference
    gradient oracle (tests/test_ref_oracle_grads.py) differentiates it
    directly against the reference's own backward pass.
    """

    train_teacher = not cfg.freeze_teacher_and_pose
    train_pose = train_teacher and not cfg.freeze_pose
    # --no_ssim (`manydepth/trainer.py:318,1217`): pure-L1 photometric loss
    reproj_fn = (losses.l1_reprojection_loss if cfg.no_ssim
                 else losses.reprojection_loss)
    if (cfg.temporal or cfg.main_temporal) and seg_fn is None:
        raise ValueError("cfg.temporal requires a segmentation seg_fn")
    if cfg.learn_ens:
        # `--learn_ens` selects outputs["ens_disp"] as the distillation
        # ensemble (`manydepth/loss_utils.py:240-241`), but NO module in the
        # reference ever produces "ens_disp" (grepped the full snapshot) —
        # the flag crashes upstream with a KeyError. Surfaced here as an
        # explicit error rather than silently diverging.
        raise NotImplementedError(
            "learn_ens: the reference's ens_disp producer is missing from "
            "its snapshot (manydepth/loss_utils.py:240 reads a key no "
            "module writes); the (mono+multi)/2 ensemble is the working "
            "path")

    def temporal_syn(batch, warped, seg_variables, inst_cur):
        """Temporal-hint synthesized frames (`dyn_utils.py:121-170`).

        Per-frame segmenter calls at batch B; `inst_cur` is computed once by
        the caller and shared between the mono and multi syntheses (5 Swin
        forwards/step instead of the reference's 6). Concatenating the
        triplet into one 3B forward measured SLOWER on v5e (5.1 -> 3.3 fps:
        worse tiling + the current-frame dedup is lost)."""
        from mal_tpu.temporal import image_synthesis

        # frozen segmenter: the reference runs Mask2Former under
        # torch.no_grad (`dyn_utils.py:185-186`) — cut gradients into it
        # (also removes the pointless Swin-L backward from the step)
        inst_last = seg_fn(seg_variables, jax.lax.stop_gradient(warped[0]))
        inst_next = seg_fn(seg_variables, jax.lax.stop_gradient(warped[1]))
        syn_l, syn_n, _ = image_synthesis(
            warped[0], warped[1], inst_cur, inst_last, inst_next,
            cfg.ins_threshold,
            payload_dtype=(jnp.bfloat16
                           if cfg.compute_dtype == "bfloat16" else None))
        return [syn_l, syn_n]

    def _mono_call(rng_noise, disp, color0, warped, identity, syn):
        return losses.mono_losses(
            rng_noise, disp, color0, warped, identity, syn=syn,
            smoothness_weight=cfg.disparity_smoothness,
            reproj_fn=reproj_fn, avg_reprojection=cfg.avg_reprojection,
            disable_automasking=cfg.disable_automasking)

    def _multi_call(disp, color0, warped, multi_depth, mono_depth_sg, cmask,
                    aug_mask, mono_min_reproj, syn, ens_reproj, dual_mono):
        return losses.multi_losses(
            disp, color0, warped, multi_depth, mono_depth_sg, cmask,
            aug_mask, mono_min_reproj, syn=syn,
            ensemble_min_reproj=ens_reproj,
            dual_distil_mono_depth=dual_mono,
            smoothness_weight=cfg.disparity_smoothness,
            reproj_fn=reproj_fn, avg_reprojection=cfg.avg_reprojection)

    if cfg.remat:
        # --set remat=true: rematerialize the loss pyramids. The mono/multi
        # loss assemblies hold the largest full-res intermediates of the
        # step (per-frame SSIM statistic maps, automask stacks, distil
        # min/argmin composites — benchmarks/PROFILE.md); checkpointing them
        # recomputes those maps in the backward instead of storing them,
        # trading a second pass over already-bandwidth-cheap elementwise ops
        # for peak-HBM headroom (larger batches / longer schedules).
        _mono_call = jax.checkpoint(_mono_call)
        _multi_call = jax.checkpoint(_multi_call)

    def loss_fn(params, batch_stats, min_d, max_d, balancer, batch: dict,
                rng_model: Array, rng_noise: Array, epoch: Array,
                seg_variables=None):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, min_d, max_d, rng_model, train=True,
            train_teacher=train_teacher, train_pose=train_pose,
            mutable=["batch_stats"],
        )
        color0 = batch["color"]["0"]
        identity = [batch["color"][str(f)] for f in cfg.frame_ids[1:]]

        _, mono_depth = geometry.disp_to_depth(
            outputs["mono_disp"], cfg.min_depth, cfg.max_depth)
        _, multi_depth = geometry.disp_to_depth(
            outputs["disp"], cfg.min_depth, cfg.max_depth)

        # one batched gather for every (depth-set x frame) warp
        depth_specs = [(mono_depth, False), (multi_depth, True)]
        use_ens = cfg.distil and cfg.use_ensemble
        if use_ens:
            disp_ens = jax.lax.stop_gradient(
                (outputs["mono_disp"] + outputs["disp"]) / 2.0)
            _, ens_depth = geometry.disp_to_depth(
                disp_ens, cfg.min_depth, cfg.max_depth)
            depth_specs.append((ens_depth, True))
        warps = _all_photometric_warps(cfg, batch, outputs, depth_specs)
        mono_warped, multi_warped = warps[0], warps[1]

        # --- teacher ---
        # current-frame instances: from the precomputed cache when
        # cfg.seg_cache_root is set (bit-exact, orientation-matched —
        # `segment/cache.py`), else one online segmenter forward
        inst_cur = None
        if cfg.temporal or cfg.main_temporal:
            if cfg.seg_cache_root is not None:
                from mal_tpu.segment.cache import instances_from_batch
                inst_cur = instances_from_batch(batch)
            else:
                inst_cur = seg_fn(seg_variables, batch["color"]["0"])
        mono_syn = (temporal_syn(batch, mono_warped, seg_variables,
                                 inst_cur)
                    if cfg.temporal else ())
        mono_out = _mono_call(rng_noise, outputs["mono_disp"], color0,
                              mono_warped, identity, mono_syn)

        # --- student ---
        mono_depth_sg = jax.lax.stop_gradient(mono_depth)
        if cfg.disable_motion_masking:
            # --disable_motion_masking: neither the cost-volume confidence
            # nor the matching mask gates the multi reprojection
            # (`manydepth/trainer.py:1323-1327,1080-1082`)
            cmask = jnp.ones_like(outputs["consistency_mask"])
        else:
            cmask = outputs["consistency_mask"] * losses.matching_mask(
                mono_depth_sg, outputs["lowest_cost"])

        ens_reproj = None
        if use_ens:
            ens_reproj = jax.lax.stop_gradient(
                losses.min_reprojection(warps[2], color0,
                                        reproj_fn=reproj_fn))

        multi_syn = (temporal_syn(batch, multi_warped, seg_variables,
                                  inst_cur)
                     if cfg.main_temporal else ())
        multi_out = _multi_call(
            outputs["disp"], color0, multi_warped, multi_depth,
            mono_depth_sg, cmask, outputs["augmentation_mask"],
            jax.lax.stop_gradient(mono_out.min_reproj), multi_syn,
            ens_reproj, mono_depth if cfg.dual_distil else None)

        # --- total loss (`trainer.py:624-642`) ---
        ori_loss = multi_out.loss
        if train_teacher:
            ori_loss = ori_loss + mono_out.loss

        if cfg.distil and cfg.pareto:
            # --pareto (`loss_utils.py:256-263`): weights come from an MGDA
            # min-norm solve over the (multi, distil) gradients — computed
            # by the pareto train step (three VJP pulls from one forward);
            # here the components are exposed and combined with weights
            # passed back in via aux. The mono loss joins UNWEIGHTED and
            # doubled: the reference's merge aliasing ("loss/0"/"loss"
            # point at the same tensor, `loss_utils.py:277-279` +
            # `trainer.py:625-627` +=) double-adds it exactly as in the
            # plain-distil branch below.
            mono_term = 2.0 * mono_out.loss if train_teacher else 0.0
            components = jnp.stack(
                [multi_out.loss, multi_out.distil_loss,
                 jnp.asarray(mono_term, jnp.float32)])
            total = multi_out.loss + multi_out.distil_loss + mono_term
            new_balancer = balancer
        elif cfg.distil and cfg.loss_blc:
            lam = jnp.maximum(
                cfg.lambda_for_adjust_start
                + epoch * cfg.lambda_for_adjust_slope,
                cfg.lambda_for_adjust_min)
            total, new_balancer = losses.loss_balance(
                balancer,
                jnp.stack([ori_loss, multi_out.distil_loss]), lam)
            # the reference's `LossBalancing.compute_loss` re-adds the same
            # weighted scalar once PER BATCH ITEM (`loss_utils.py:303-312`
            # accumulates w·loss inside `for index_batch in range(bs)`), so
            # the trained objective is bs x the weighted sum — verified
            # against its backward (tests/test_ref_oracle_grads_blc.py:
            # every gradient exactly halved at bs=2 without this)
            total = total * color0.shape[0]
        elif cfg.distil:
            # The reference's plain-distil total counts the mono loss TWICE:
            # `compute_main_losses` stores the same tensor under both
            # "loss/0" and "loss" (`loss_utils.py:277-279`), so the merge's
            # in-place `losses[key] += val` (`trainer.py:625-627`,
            # Tensor.__iadd__) adds mono_losses into that shared tensor once
            # via "loss/0" and again via "loss". Verified against the
            # reference's own backward (tests/test_ref_oracle_grads.py):
            # teacher/pose grads are exactly doubled. The loss_blc branch is
            # unaffected (`loss_list[0] += mono` runs once, and "loss" is
            # overwritten by the balancer), as is non-distil
            # (`compute_losses` ends with `total_loss /= (sclm+1)`, a fresh
            # tensor — `trainer.py:1467-1469`).
            total = multi_out.loss + multi_out.distil_loss
            if train_teacher:
                total = total + 2.0 * mono_out.loss
            new_balancer = balancer
        else:
            total = ori_loss
            new_balancer = balancer

        aux = {
            "batch_stats": mutated["batch_stats"],
            "balancer": new_balancer,
            "mono_depth": mono_depth_sg,
            # (multi, distil, 2*mono) for the pareto step's per-loss VJPs
            "components": (components if cfg.distil and cfg.pareto
                           else jnp.zeros(3)),
            "metrics": {
                "loss": total,
                "ori_loss": ori_loss,
                "mono_reproj": mono_out.reproj_loss,
                "multi_reproj": multi_out.reproj_loss,
                "consistency_loss": multi_out.consistency_loss,
                "distil_loss": multi_out.distil_loss,
                "w_ori": new_balancer.w[0],
                "w_distil": new_balancer.w[1],
            },
        }
        if cfg.loss_pct:
            # --loss_pct (`manydepth/trainer.py:1337-1344`): reference wandb
            # keys Train/pp_t_<scale> (teacher) / pp_m_<scale> (student)
            aux["metrics"]["pp_t_0"] = mono_out.mask_pct
            aux["metrics"]["pp_m_0"] = multi_out.mask_pct
        return total, aux

    return loss_fn


def make_train_step(cfg: Config, model, tx: optax.GradientTransformation,
                    seg_fn: Callable | None = None) -> Callable:
    """Build the jit-able train step for a given config/model/optimizer.

    `seg_fn(images (B,H,W,3)) -> Instances` is the frozen instance-
    segmentation front-end for the MAL temporal hint (the reference runs
    Mask2Former inside the train loop, `manydepth/trainer.py:350-357`;
    `dyn_utils.py:172-188`). Required when cfg.temporal/main_temporal.
    """

    train_teacher = not cfg.freeze_teacher_and_pose
    loss_fn = make_loss_fn(cfg, model, seg_fn=seg_fn)

    def train_step(state: TrainState, batch: dict, rng: Array,
                   epoch: Array, seg_variables=None):
        rng_model, rng_noise = jax.random.split(rng)
        min_d, max_d = state.bins.min_depth, state.bins.max_depth

        pareto_metrics = None
        if cfg.distil and cfg.pareto:
            # --pareto: one forward, three VJP pulls (multi / distil /
            # doubled-mono), MGDA min-norm weights over the first two
            # (`loss_utils.py:256-263`; `mal_tpu/pareto.py`)
            from mal_tpu.pareto import pareto_weights_2task

            def comp_fn(params):
                total, aux = loss_fn(params, state.batch_stats, min_d,
                                     max_d, state.balancer, batch,
                                     rng_model, rng_noise, epoch,
                                     seg_variables)
                return aux["components"], aux

            comps, vjp_fn, aux = jax.vjp(comp_fn, state.params,
                                         has_aux=True)
            g_multi = vjp_fn(jnp.array([1.0, 0.0, 0.0]))[0]
            g_distil = vjp_fn(jnp.array([0.0, 1.0, 0.0]))[0]
            g_mono = vjp_fn(jnp.array([0.0, 0.0, 1.0]))[0]
            c0, c1 = cfg.pareto_c
            w0, w1 = pareto_weights_2task(g_multi, g_distil, c0, c1)
            grads = jax.tree.map(
                lambda a, b, c: w0 * a + w1 * b + c,
                g_multi, g_distil, g_mono)
            weighted = w0 * comps[0] + w1 * comps[1]
            pareto_metrics = {
                "loss": weighted + comps[2],
                "w_ori": w0,
                "w_distil": w1,
                # the reference logs w0 x the already-reweighted loss
                # (`loss_utils.py:261` reads `loss` AFTER line 260 rebinds
                # it) — reproduced for log parity
                "ori_loss": w0 * weighted,
            }
        else:
            grads, aux = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, min_d, max_d,
                state.balancer, batch, rng_model, rng_noise, epoch,
                seg_variables)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # adaptive depth bins from the teacher (`trainer.py:631-634`)
        if cfg.adaptive_bins and train_teacher:
            new_bins = state.bins.update(aux["mono_depth"], cfg.min_depth,
                                         cfg.depth_bin_ema)
        else:
            new_bins = state.bins

        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
            bins=new_bins,
            balancer=aux["balancer"],
        )
        metrics = dict(aux["metrics"])
        if pareto_metrics is not None:
            metrics.update(pareto_metrics)
        metrics["min_depth_bin"] = new_bins.min_depth
        metrics["max_depth_bin"] = new_bins.max_depth
        return new_state, metrics

    return train_step


def train_step(cfg, model, tx, state, batch, rng, epoch):
    """Convenience non-cached entry; prefer jit(make_train_step(...))."""
    return make_train_step(cfg, model, tx)(state, batch, rng, epoch)
