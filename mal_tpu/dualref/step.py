"""DualRefine training step.

Functional re-design of `dualrefine/trainer.py:274-767` (process_batch +
compute_losses + compute_pose_update_losses), structured EXACTLY like the
reference's default path and validated gradient-for-gradient against it
(tests/test_ref_oracle_grads_dualref.py):

- loss states: scales (0, 2, 3) — scale 1 is skipped by an explicit
  `continue` (`trainer.py:547-548`) but still counts in the /num_scales=4
  normalizer; scales 0 and 2 supervise deq_iters 0..n_losses, scale 3 only
  iter 0 (`trainer.py:545`).
- warps: disp upsampled to full res (bilinear, align_corners=False), depth
  via disp_to_depth, inverse-warp of frame -1 with the PIXEL-CENTER
  projection + grid_sample(border, align_corners=False) — DualRefine's
  convention (`layers.py:216-226`, `trainer.py:380-383`), not ManyDepth's
  (W-1)/align_corners=True.
- poses: iter 0 pairs with the initial pose T0, iters >0 with the refined
  T* (NOT detached — `Dstar_T0_pair` is off by default,
  `trainer.py:...generate_images_pred`).
- iter>0 masks: automask x the model's consistency mask (nearest-resized
  to full res, `trainer.py:308-313`); consistency |D_k - detach(D_0)| on
  the complement.
- ACCUMULATION QUIRK reproduced: `total_loss += loss` sits INSIDE the
  deq_iter loop while `loss` accumulates across iters (`trainer.py:
  624-632`), so iter k is counted (n_losses+1-k) times: with n_losses=1,
  total = (2*L(s,0) + L(s,1)) summed over scales, / 4.
- pose-update loss (`trainer.py:699-767`): the refined pose T* warps frame
  -1 with the REFINED depth (0, n_losses) WITH gradients (`Tstar_D0_pair`
  off by default), automasked, added on top. NOTE: the reference's
  `pose_update_generate_images_pred` ends in a leftover debug
  `print(...); exit(0)` (`trainer.py:...`), so upstream training
  terminates on the first batch; the oracle shims `exit` to validate the
  computation the code specifies up to that point.
- smoothness: per (scale, iter) on the RAW scale-s disparity against the
  scale-s color pyramid, weight / 2^s. The batch may carry dataset pyramid
  colors as `color_s{2,3}` (the reference resizes with PIL ANTIALIAS);
  without them the step falls back to bilinear resizing the full-res frame
  (documented deviation, only affects the edge weights of the smoothness
  term).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mal_tpu import geometry, losses
from mal_tpu.config import Config
from mal_tpu.ops.interp import grid_sample, resize_bilinear, resize_nearest
from mal_tpu.train.state import TrainState

Array = jax.Array


def warp_frame_center(src: Array, depth: Array, T: Array, K: Array,
                      inv_K: Array) -> Array:
    """Inverse-warp with DualRefine's conventions (pixel-center projection,
    border padding, align_corners=False)."""
    B, H, W, _ = src.shape
    points = geometry.backproject(depth[..., 0], inv_K, H, W)
    grid = geometry.project_3d_center(points, K, T, H, W)
    return grid_sample(src, grid, padding_mode="border", align_corners=False)


def make_dualref_loss_fn(cfg: Config, model) -> Callable:
    """`loss_fn(params, batch_stats, batch, rng_noise) -> (total, aux)` —
    the reference's per-batch training loss as a gradable function."""
    assert tuple(cfg.frame_ids[:2]) == (0, -1), \
        "DualRefine trains on the (0, -1) frame pair"
    # reference default frame_ids [0, -1, 1]: frame -1 runs the full DEQ,
    # frame +1 a pose-net-only forward; the loss takes the per-pixel MIN
    # over both frames' reprojections (`trainer.py:288-330,555-558`)
    use_p1 = len(cfg.frame_ids) > 2 and cfg.frame_ids[2] == 1
    n_losses = cfg.deq_n_losses
    NUM_SCALES = 4  # len(reference scales [0,1,2,3]); scale 1 contributes 0

    def loss_fn(params, batch_stats, batch: dict, rng_noise: Array):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables, batch["color_aug"]["0"], batch["color_aug"]["-1"],
            batch["K"], invert=True, train=True,
            mutable=["batch_stats"],
            image3=batch["color_aug"]["1"] if use_p1 else None)
        out, (pose0, pose_star) = outputs
        pose_p1 = out.get("pose_p1")

        color0 = batch["color"]["0"]
        colorm1 = batch["color"]["-1"]
        colorp1 = batch["color"]["1"] if use_p1 else None
        H, W = color0.shape[1:3]
        K, inv_K = batch["K"], batch["inv_K"]

        cmask_full = None
        if "consistency_mask" in out:
            cm = out["consistency_mask"].astype(color0.dtype)
            if cm.ndim == 3:
                cm = cm[..., None]
            cmask_full = resize_nearest(cm, H, W)

        ident_map = losses.reprojection_loss(colorm1, color0)
        if use_p1:
            ident_map = jnp.minimum(
                ident_map, losses.reprojection_loss(colorp1, color0))

        def warp_p1(depth, k):
            T = pose_p1 if k == 0 else jax.lax.stop_gradient(pose_p1)
            return warp_frame_center(colorp1, depth, T, K, inv_K)

        def state_loss(scale, k, rng_k):
            disp_s = out[f"disp_{scale}_{k}"]
            disp_full = (disp_s if disp_s.shape[1] == H
                         else resize_bilinear(disp_s, H, W))
            _, depth = geometry.disp_to_depth(disp_full, cfg.min_depth,
                                              cfg.max_depth)
            T = pose0 if k == 0 else pose_star
            warped = warp_frame_center(colorm1, depth, T, K, inv_K)
            r = losses.reprojection_loss(warped, color0)
            if use_p1:
                r = jnp.minimum(
                    r, losses.reprojection_loss(warp_p1(depth, k), color0))
            noise = jax.random.normal(rng_k, ident_map.shape) * 1e-5
            mask = losses.automask(r, ident_map + noise)
            consistency = 0.0
            if k > 0:
                if cmask_full is not None:
                    mask = mask * cmask_full
                depth0 = state_depths[(scale, 0)]
                consistency = jnp.mean(
                    jnp.abs(depth - jax.lax.stop_gradient(depth0))
                    * (1.0 - mask))
            reproj = jnp.sum(r * mask) / (jnp.sum(mask) + 1e-7)

            sh, sw = H // (2 ** scale), W // (2 ** scale)
            if f"color_s{scale}" in batch:
                color_s = batch[f"color_s{scale}"]
            elif scale == 0:
                color_s = color0
            else:
                color_s = resize_bilinear(color0, sh, sw)
            sm = losses.normalized_smooth_loss(disp_s, color_s)
            return (reproj + consistency
                    + cfg.disparity_smoothness * sm / (2 ** scale),
                    reproj, depth, consistency)

        total = 0.0
        metrics = {}
        state_depths = {}
        for scale in (0, 2, 3):
            iters = range(n_losses + 1) if scale in (0, 1, 2) else range(1)
            loss_acc = 0.0
            for k in iters:
                L, reproj, depth, consistency = state_loss(
                    scale, k, jax.random.fold_in(rng_noise, 10 * scale + k))
                state_depths[(scale, k)] = depth
                loss_acc = loss_acc + L
                # reference quirk: total_loss += loss INSIDE the iter loop
                # with loss accumulating across iters (`trainer.py:624-632`)
                total = total + loss_acc
                if scale == 0:
                    metrics[f"reproj_{k}"] = reproj
                    if k > 0:
                        metrics["consistency_loss"] = consistency
        total = total / NUM_SCALES

        # --- pose-update loss: T* with the REFINED depth, with gradients
        # (`Tstar_D0_pair` default off; `trainer.py:699-767`). Skipped
        # entirely under --disable_pose_updates (`trainer.py:334-340`) ---
        if cfg.disable_pose_updates:
            pose_loss = jnp.zeros(())
        else:
            _, depth_p = geometry.disp_to_depth(
                out[f"disp_0_{n_losses}"] if f"disp_0_{n_losses}" in out
                else out["disp_0_0"], cfg.min_depth, cfg.max_depth)
            warped_p = warp_frame_center(colorm1, depth_p, pose_star, K,
                                         inv_K)
            r_p = losses.reprojection_loss(warped_p, color0)
            if use_p1:
                # frame +1's pred in the pose-update loss is the (scale 0,
                # iter 0) warp (`trainer.py:715`: outputs[("color", f, 0, 0)])
                r_p = jnp.minimum(
                    r_p, losses.reprojection_loss(
                        warp_p1(state_depths[(0, 0)], 0), color0))
            noise = jax.random.normal(jax.random.fold_in(rng_noise, 99),
                                      ident_map.shape) * 1e-5
            m_p = losses.automask(r_p, ident_map + noise)
            pose_loss = jnp.sum(r_p * m_p) / (jnp.sum(m_p) + 1e-7)
            total = total + pose_loss

        metrics["pose_loss"] = pose_loss
        metrics.setdefault("consistency_loss", jnp.zeros(()))
        metrics["loss"] = total
        aux = {"batch_stats": mutated.get("batch_stats", batch_stats),
               "depth0": jax.lax.stop_gradient(state_depths[(0, 0)]),
               "metrics": metrics}
        return total, aux

    return loss_fn


def make_dualref_train_step(cfg: Config, model,
                            tx: optax.GradientTransformation) -> Callable:
    loss_fn = make_dualref_loss_fn(cfg, model)

    def train_step(state: TrainState, batch: dict, rng: Array, epoch: Array):
        del epoch
        rng_noise = jax.random.fold_in(rng, 1)

        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng_noise)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_bins = state.bins
        if cfg.adaptive_bins:
            # DualRefine additionally tracks mean/median EMAs
            # (`dualrefine/trainer.py:350-372`)
            new_bins = state.bins.update(aux["depth0"], cfg.min_depth,
                                         cfg.depth_bin_ema, track_stats=True)

        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=aux["batch_stats"], opt_state=new_opt_state,
            bins=new_bins, balancer=state.balancer)
        return new_state, aux["metrics"]

    return train_step
