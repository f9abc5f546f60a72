"""DualRefine training step.

Functional re-design of `dualrefine/trainer.py:530-767`: photometric losses
over the DEQ trajectory states — the initial (deq_iter=0) disparity with the
initial pose, the refined (deq_iter>=1, phantom-gradient) disparity with the
refined pose — consistency-masked against the init prediction, plus the
pose-update reprojection loss (refined pose paired with the *initial* depth,
`trainer.py:699-767`).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mal_tpu import geometry, losses
from mal_tpu.config import Config
from mal_tpu.ops.interp import resize_bilinear
from mal_tpu.train.state import TrainState
from mal_tpu.train.step import warp_frame

Array = jax.Array


def make_dualref_train_step(cfg: Config, model,
                            tx: optax.GradientTransformation) -> Callable:
    assert tuple(cfg.frame_ids[:2]) == (0, -1), \
        "DualRefine trains on the (0, -1) frame pair"

    def train_step(state: TrainState, batch: dict, rng: Array, epoch: Array):
        del epoch
        rng_noise = jax.random.fold_in(rng, 1)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mutated = model.apply(
                variables, batch["color_aug"]["0"], batch["color_aug"]["-1"],
                batch["K"], invert=True, train=True,
                mutable=["batch_stats"])
            out, (pose0, pose_star) = outputs

            color0 = batch["color"]["0"]
            colorm1 = batch["color"]["-1"]
            identity = [colorm1]
            H, W = color0.shape[1:3]

            def reproj_loss_at(disp_full, pose, rng_k):
                _, depth = geometry.disp_to_depth(disp_full, cfg.min_depth,
                                                  cfg.max_depth)
                warped = warp_frame(colorm1, depth, pose, batch["K"],
                                    batch["inv_K"])
                r = losses.reprojection_loss(warped, color0)
                ident = losses.reprojection_loss(colorm1, color0)
                noise = jax.random.normal(rng_k, ident.shape) * 1e-5
                mask = losses.automask(r, ident + noise)
                return r, mask, depth

            total = 0.0
            metrics = {}

            # --- deq_iter = 0: init disp + init pose ---
            r0, m0, depth0 = reproj_loss_at(out["disp_0_0"], pose0,
                                            jax.random.fold_in(rng_noise, 0))
            loss0 = jnp.sum(r0 * m0) / (jnp.sum(m0) + 1e-7)
            sm0 = losses.normalized_smooth_loss(out["disp_0_0"], color0)
            total += loss0 + cfg.disparity_smoothness * sm0
            metrics["reproj_0"] = loss0

            # --- refined trajectory states: disp_0_k + refined pose,
            # consistency-masked (`trainer.py:530-697` sums losses over every
            # supervised ("disp", scale, deq_iter) state; k>1 only with
            # --n_losses fixed-point correction) ---
            ks = []
            k = 1
            while f"disp_0_{k}" in out:
                ks.append(k)
                k += 1
            for k in ks:
                r1, m1, depth1 = reproj_loss_at(
                    out[f"disp_0_{k}"], pose_star,
                    jax.random.fold_in(rng_noise, k))
                if "consistency_mask" in out:
                    cmask = resize_bilinear(
                        out["consistency_mask"].astype(r1.dtype), H, W)
                    m1 = m1 * cmask
                cons_mask = 1.0 - m1
                loss1 = jnp.sum(r1 * m1) / (jnp.sum(m1) + 1e-7)
                consistency = jnp.mean(
                    jnp.abs(depth1 - jax.lax.stop_gradient(depth0))
                    * cons_mask)
                sm1 = losses.normalized_smooth_loss(out[f"disp_0_{k}"], color0)
                total += loss1 + consistency + cfg.disparity_smoothness * sm1
                if k == ks[-1]:
                    metrics["reproj_1"] = loss1
                    metrics["consistency_loss"] = consistency

            # --- scale-2 smoothness for all states (`trainer.py:626-630`) ---
            color_s2 = resize_bilinear(color0, H // 4, W // 4)
            for k in [0] + ks:
                sm = losses.normalized_smooth_loss(out[f"disp_2_{k}"], color_s2)
                total += cfg.disparity_smoothness * sm / 4.0

            # --- pose-update loss: refined pose + *initial* depth ---
            r_p, m_p, _ = reproj_loss_at(
                jax.lax.stop_gradient(out["disp_0_0"]), pose_star,
                jax.random.fold_in(rng_noise, 2))
            pose_loss = jnp.sum(r_p * m_p) / (jnp.sum(m_p) + 1e-7)
            total += pose_loss
            metrics["pose_loss"] = pose_loss
            metrics["loss"] = total

            aux = {"batch_stats": mutated.get("batch_stats", state.batch_stats),
                   "depth0": jax.lax.stop_gradient(depth0),
                   "metrics": metrics}
            return total, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_bins = state.bins
        if cfg.adaptive_bins:
            new_bins = state.bins.update(aux["depth0"], cfg.min_depth,
                                         cfg.depth_bin_ema)

        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=aux["batch_stats"], opt_state=new_opt_state,
            bins=new_bins, balancer=state.balancer)
        return new_state, aux["metrics"]

    return train_step
