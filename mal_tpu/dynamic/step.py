"""DynamicDepth training step.

Functional re-design of `dynamicdepth/trainer.py:432-660` (process_batch):
the teacher/student photometric losses run over the *DOMD-processed* adjacent
frames (objects moved to their warped positions, old positions blanked), so
dynamic objects stop violating the static-scene photometric assumption.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mal_tpu import geometry, losses
from mal_tpu.config import Config
from mal_tpu.train.state import TrainState
from mal_tpu.train.step import warp_frame

Array = jax.Array


def make_dynamic_loss_fn(cfg: Config, model,
                         doj_fn: Callable | None = None) -> Callable:
    """The pure DynamicDepth loss: `loss_fn(params, batch_stats, min_d,
    max_d, batch, rng_model, rng_noise, seg_variables=None) -> (total, aux)`
    — the training work of `dynamicdepth/trainer.py:435-660` as a gradable
    function (the reference-gradient oracle differentiates it directly).

    `doj_fn(seg_variables, images) -> (B, H, W)` generates the dynamic-
    object masks online (cfg.online_doj, `segment/doj.py`) in place of the
    dataset's precomputed `.npy` masks."""
    train_teacher = not cfg.freeze_teacher_and_pose
    if cfg.online_doj:
        assert doj_fn is not None, "cfg.online_doj requires a doj_fn"

    def loss_fn(params, batch_stats, min_d, max_d, batch: dict,
                rng_model: Array, rng_noise: Array, seg_variables=None):
        if doj_fn is not None:
            batch = dict(batch)
            batch["doj_mask"] = doj_fn(seg_variables, batch["color"]["0"])
            for f in cfg.frame_ids[1:]:
                batch[f"doj_mask{f:+d}"] = doj_fn(seg_variables,
                                                  batch["color"][str(f)])

        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, min_d, max_d, rng_model, train=True,
            train_teacher=train_teacher, mutable=["batch_stats"])

        color0 = batch["color"]["0"]
        adj = {-1: outputs["domd_color/-1"], 1: outputs["domd_color/1"]}

        _, mono_depth = geometry.disp_to_depth(
            outputs["mono_disp"], cfg.min_depth, cfg.max_depth)
        _, multi_depth = geometry.disp_to_depth(
            outputs["disp"], cfg.min_depth, cfg.max_depth)

        def warps(sources, depth, detach):
            out = []
            for src, f in zip(sources, cfg.frame_ids[1:]):
                T = outputs[f"cam_T_cam/0/{f}"]
                if detach:
                    T = jax.lax.stop_gradient(T)
                out.append(warp_frame(src, depth, T, batch["K"],
                                      batch["inv_K"]))
            return out

        identity = [adj[f] for f in cfg.frame_ids[1:]]
        # Under the reference DEFAULT no_teacher_warp (store_false ->
        # True), the MONO path's warp sources AND identity preds are the
        # `ori_color` frames (`trainer.py:936-955`): ori_color[-1] = the
        # pristine frame -1 (`:504-505`), and ori_color[+1] = the MUTATED
        # frame -1 — an upstream copy-paste (`:528-529` clones color[-1]
        # post-mutation), which is exactly outputs["domd_color/-1"]. Only
        # the multi path warps the DOMD'd frames.
        mono_sources = identity
        if (cfg.no_teacher_warp and not cfg.train_teacher_only
                and not cfg.no_warp and "doj_mask" in batch):
            mono_sources = [batch["color"]["-1"], adj[-1]]
        mono_identity = mono_sources
        mono_warped = warps(mono_sources, mono_depth, False)
        multi_warped = warps(identity, multi_depth, True)

        if cfg.zero_img:
            # the reference's zero_img mutates the shared frame-0 target
            # across the whole loss pass in exact call order: mono warps ->
            # mono identity -> (smoothness sees it) -> multi warps
            # (`trainer.py:958-966` + compute_losses structure); replicate
            # with a threaded target (losses.zero_img_reproj_sequence)
            w_maps, tgt = losses.zero_img_reproj_sequence(color0, mono_warped)
            i_maps, tgt = losses.zero_img_reproj_sequence(tgt, mono_identity)
            mono_out = losses.mono_losses(
                rng_noise, outputs["mono_disp"], color0, mono_warped,
                mono_identity, smoothness_weight=cfg.disparity_smoothness,
                selec_reproj=cfg.selec_reproj,
                disable_automasking=cfg.disable_automasking,
                reproj_maps=w_maps, identity_maps=i_maps, smooth_color=tgt)
        else:
            mono_out = losses.mono_losses(
                rng_noise, outputs["mono_disp"], color0, mono_warped,
                mono_identity, smoothness_weight=cfg.disparity_smoothness,
                selec_reproj=cfg.selec_reproj,
                disable_automasking=cfg.disable_automasking)

        mono_depth_sg = jax.lax.stop_gradient(mono_depth)
        if cfg.disable_motion_masking:
            # --disable_motion_masking (`dynamicdepth/trainer.py:603,
            # 1080-1082`): no confidence/matching gate on the multi loss
            cmask = jnp.ones_like(outputs["consistency_mask"])
        else:
            cmask = outputs["consistency_mask"] * losses.matching_mask(
                mono_depth_sg, outputs["lowest_cost"])
        if cfg.zero_img:
            mw_maps, tgt = losses.zero_img_reproj_sequence(tgt, multi_warped)
            # the multi pass recomputes identity losses (mutation is a
            # no-op: those holes are already zeroed) and its automask is
            # overridden by ones x consistency, so the maps are unused
            multi_out = losses.multi_losses(
                outputs["disp"], color0, multi_warped,
                multi_depth, mono_depth_sg, cmask,
                outputs["augmentation_mask"],
                jax.lax.stop_gradient(mono_out.min_reproj),
                ensemble_min_reproj=None,
                smoothness_weight=cfg.disparity_smoothness,
                selec_reproj=cfg.selec_reproj, reproj_maps=mw_maps,
                smooth_color=tgt)
        else:
            multi_out = losses.multi_losses(
                outputs["disp"], color0, multi_warped,
                multi_depth, mono_depth_sg, cmask,
                outputs["augmentation_mask"],
                jax.lax.stop_gradient(mono_out.min_reproj),
                ensemble_min_reproj=None,
                smoothness_weight=cfg.disparity_smoothness,
                selec_reproj=cfg.selec_reproj)

        # teacher-loss merge (`dynamicdepth/trainer.py:631-643`): --tempv2
        # drops the mono losses from the total (the merge loop passes);
        # --no_multi_loss REPLACES the multi losses with the mono ones
        # (`losses[key] = val` instead of `+=`)
        total = multi_out.loss
        if train_teacher and not cfg.tempv2:
            total = mono_out.loss if cfg.no_multi_loss \
                else total + mono_out.loss
        if cfg.distil:
            total = total + multi_out.distil_loss
        feat_l = jnp.zeros(())
        if cfg.feat_loss:
            feat_l = losses.feature_metric_loss(
                outputs["feat"], color0, cfg.feat_dis, cfg.feat_cvt)
            total = total + feat_l

        aux = {"batch_stats": mutated["batch_stats"],
               "mono_depth": mono_depth_sg,
               "metrics": {
                   "loss": total,
                   "mono_reproj": mono_out.reproj_loss,
                   "multi_reproj": multi_out.reproj_loss,
                   "consistency_loss": multi_out.consistency_loss,
                   "distil_loss": multi_out.distil_loss,
                   "feat_loss": feat_l,
               }}
        return total, aux

    return loss_fn


def make_dynamic_train_step(cfg: Config, model,
                            tx: optax.GradientTransformation,
                            doj_fn: Callable | None = None) -> Callable:
    """Jit-able DynamicDepth train step: jax.grad of `make_dynamic_loss_fn`
    plus optimizer / adaptive-bins state plumbing."""
    train_teacher = not cfg.freeze_teacher_and_pose
    loss_fn = make_dynamic_loss_fn(cfg, model, doj_fn=doj_fn)

    def train_step(state: TrainState, batch: dict, rng: Array, epoch: Array,
                   seg_variables=None):
        rng_model, rng_noise = jax.random.split(rng)
        min_d, max_d = state.bins.min_depth, state.bins.max_depth

        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, min_d, max_d, batch,
            rng_model, rng_noise, seg_variables)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        if cfg.adaptive_bins and train_teacher:
            new_bins = state.bins.update(aux["mono_depth"], cfg.min_depth,
                                         cfg.depth_bin_ema)
        else:
            new_bins = state.bins

        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=aux["batch_stats"], opt_state=new_opt_state,
            bins=new_bins, balancer=state.balancer)
        return new_state, aux["metrics"]

    return train_step
