"""Self-supervised depth losses + MAL hints (pure JAX, NHWC).

One shared implementation of:
- SSIM+L1 reprojection with min-reprojection automasking
  (`manydepth/loss_utils.py:27-55`, `manydepth/trainer.py:1211-1243`)
- edge-aware disparity smoothness (`manydepth/layers.py:210-223`)
- teacher (mono) losses (`manydepth/loss_utils.py:57-129`)
- student (multi) losses with consistency masking and the MAL
  *distillation hint* — per-pixel {mono, ensemble, multi} argmin selection
  (`manydepth/loss_utils.py:131-281`)
- automatic two-term loss re-balancing as a *functional* state
  (`manydepth/loss_utils.py:283-345`), instead of host-side numpy.

All stochasticity (automask tie-break noise) takes an explicit PRNG key.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from mal_tpu.ops.ssim import ssim

Array = jax.Array


def reprojection_loss(pred: Array, target: Array) -> Array:
    """0.85*SSIM + 0.15*L1, averaged over channels -> (B, H, W, 1)."""
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def l1_reprojection_loss(pred: Array, target: Array) -> Array:
    """`--no_ssim` photometric loss (`manydepth/trainer.py:1217-1218`):
    pure channel-mean L1, no SSIM term."""
    return jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)


def reprojection_loss_zero_img(pred: Array, target: Array) -> Array:
    """`--zero_img` variant (`dynamicdepth/trainer.py:955-963`), single-pair
    form: where the warped prediction is black (sum over channels < 0.1 —
    DOMD-blanked pixels), zero both pred and target so those pixels
    contribute no loss. NOTE: the reference's actual training path is the
    STATEFUL `zero_img_reproj_sequence` below — `trainer.py:965` mutates
    the shared target tensor in place without cloning."""
    black = (jnp.sum(pred, axis=-1, keepdims=True) < 0.1)
    black = jax.lax.stop_gradient(black)
    return reprojection_loss(jnp.where(black, 0.0, pred),
                             jnp.where(black, 0.0, target))


def zero_img_reproj_sequence(target: Array, preds: Sequence[Array]
                             ) -> tuple[list[Array], Array]:
    """Reference-exact `--zero_img` semantics across a SEQUENCE of preds.

    `compute_reprojection_loss` (`dynamicdepth/trainer.py:958-966`) zeroes
    the target in place (`target[mask] = 0` — pred is cloned, target is
    NOT), so each successive call sees the union of all previous preds'
    black-hole masks, and everything downstream that reads the frame-0
    color (the identity pass, the smoothness term, the later multi-frame
    `compute_losses` call) sees the final mutated tensor. Returns the
    per-pred loss maps in call order and the final target."""
    outs = []
    for pred in preds:
        hole = jax.lax.stop_gradient(
            jnp.sum(pred, axis=-1, keepdims=True) < 0.1)
        pred_z = jnp.where(hole, 0.0, pred)
        target = jnp.where(hole, 0.0, target)
        outs.append(reprojection_loss(pred_z, target))
    return outs, target


def apply_selec_reproj(reproj_all: Array, warped: Sequence[Array]) -> Array:
    """`--selec_reproj` (`dynamicdepth/trainer.py:1058-1065`): per-pixel min
    reprojection, except where one warped frame is black use the *other*
    frame's loss, and where both are black use 0.

    reproj_all: (B, H, W, F) stacked per-frame losses; warped: the F warped
    frames (F must be 2: the reference hardcodes frames {-1, +1})."""
    assert reproj_all.shape[-1] == 2 and len(warped) == 2
    m0 = jax.lax.stop_gradient(
        jnp.sum(warped[0], axis=-1, keepdims=True) < 0.1)
    m1 = jax.lax.stop_gradient(
        jnp.sum(warped[1], axis=-1, keepdims=True) < 0.1)
    out = jnp.min(reproj_all, axis=-1, keepdims=True)
    out = jnp.where(m0, reproj_all[..., 1:2], out)
    out = jnp.where(m1, reproj_all[..., 0:1], out)
    return jnp.where(m0 & m1, 0.0, out)


def feature_metric_loss(feature: Array, img: Array,
                        feat_dis: float = 0.01,
                        feat_cvt: float = 0.01) -> Array:
    """DynamicDepth feature-metric loss (`dynamicdepth/trainer.py:1135-1156`):
    -feat_dis * first-order + feat_cvt * second-order edge-weighted feature
    smoothness (encourages discriminative yet locally-smooth features).

    feature: (B, h, w, C); img: (B, H, W, 3) resized here with area
    (average-pool) interpolation like the reference's F.interpolate 'area'."""
    B, h, w, _ = feature.shape
    H, W = img.shape[1:3]
    if H % h == 0 and W % w == 0:
        fy, fx = H // h, W // w
        img_s = jnp.mean(img.reshape(B, h, fy, w, fx, -1), axis=(2, 4))
    else:
        from mal_tpu.ops.interp import resize_bilinear
        img_s = resize_bilinear(img, h, w)

    def grad(x):
        return x[:, :, 1:] - x[:, :, :-1], x[:, 1:] - x[:, :-1]

    def term(f_g, i_g):
        return jnp.mean(jnp.abs(f_g) * jnp.exp(
            -jnp.mean(jnp.abs(i_g), axis=-1, keepdims=True)))

    f_dx, f_dy = grad(feature)
    i_dx, i_dy = grad(img_s)
    smooth1 = term(f_dx, i_dx) + term(f_dy, i_dy)

    f_dxx, f_dxy = grad(f_dx)
    f_dyx, f_dyy = grad(f_dy)
    i_dxx, i_dxy = grad(i_dx)
    i_dyx, i_dyy = grad(i_dy)
    smooth2 = (term(f_dxx, i_dxx) + term(f_dxy, i_dxy)
               + term(f_dyx, i_dyx) + term(f_dyy, i_dyy))
    return -feat_dis * smooth1 + feat_cvt * smooth2


def smooth_loss(disp: Array, img: Array) -> Array:
    """Edge-aware smoothness on (mean-normalized) disparity. Scalar."""
    grad_disp_x = jnp.abs(disp[:, :, :-1] - disp[:, :, 1:])
    grad_disp_y = jnp.abs(disp[:, :-1] - disp[:, 1:])
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1] - img[:, :, 1:]), -1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1] - img[:, 1:]), -1, keepdims=True)
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def normalized_smooth_loss(disp: Array, img: Array) -> Array:
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    return smooth_loss(disp / (mean_disp + 1e-7), img)


def automask(reproj: Array, identity: Array) -> Array:
    """1 where the warped reprojection beats the identity (static-scene) loss.

    Reference: `manydepth/loss_utils.py:27-44` — argmin over [reproj, identity].
    """
    return (reproj <= identity).astype(reproj.dtype)


def min_reprojection(preds: Sequence[Array], target: Array,
                     reproj_fn=reprojection_loss) -> Array:
    """Per-pixel min over a list of reprojection losses -> (B, H, W, 1)."""
    losses = jnp.concatenate([reproj_fn(p, target) for p in preds], axis=-1)
    return jnp.min(losses, axis=-1, keepdims=True)


class MonoLossOut(NamedTuple):
    loss: Array          # scalar total (reproj + smooth)
    reproj_loss: Array   # scalar masked reprojection
    smooth: Array        # scalar smoothness
    min_reproj: Array    # (B, H, W, 1) min reprojection map (for distillation)


def mono_losses(
    rng: Array,
    disp: Array,                  # (B, H, W, 1) full-res sigmoid disparity
    color: Array,                 # (B, H, W, 3) target frame (non-aug)
    warped: Sequence[Array],      # warped adjacent frames, each (B, H, W, 3)
    identity: Sequence[Array],    # raw adjacent frames (automask)
    syn: Sequence[Array] = (),    # MAL temporal-hint synthesized frames
    smoothness_weight: float = 1e-3,
    reproj_fn=reprojection_loss,
    selec_reproj: bool = False,
    avg_reprojection: bool = False,
    disable_automasking: bool = False,
    reproj_maps: Sequence[Array] | None = None,
    identity_maps: Sequence[Array] | None = None,
    smooth_color: Array | None = None,
) -> MonoLossOut:
    """Teacher losses. Reference: `manydepth/loss_utils.py:57-129`.

    `avg_reprojection`: per-pixel MEAN over source frames instead of the
    min — the monodepth2 flag the reference parses but ships commented out
    (`loss_utils.py:171`, `trainer.py:1299`); implemented here with the
    monodepth2 semantics (mean over both warped and identity maps).
    `reproj_maps` / `identity_maps` / `smooth_color` inject precomputed
    per-frame loss maps and the smoothness color — used by the zero_img
    stateful-target path (`zero_img_reproj_sequence`)."""
    if reproj_maps is None:
        reproj_maps = [reproj_fn(p, color) for p in list(warped) + list(syn)]
    reproj_all = jnp.concatenate(list(reproj_maps), axis=-1)
    if avg_reprojection:
        reproj_min = jnp.mean(reproj_all, axis=-1, keepdims=True)
    elif selec_reproj and not syn:
        reproj_min = apply_selec_reproj(reproj_all, list(warped))
    else:
        reproj_min = jnp.min(reproj_all, axis=-1, keepdims=True)

    if disable_automasking:
        # --disable_automasking: no identity reprojections; every pixel
        # keeps the loss (`dynamicdepth/trainer.py:1030-1047,1067-1070`
        # identity_reprojection_loss=None -> a ones mask)
        mask = jnp.ones_like(reproj_min)
    else:
        if identity_maps is None:
            identity_maps = [reproj_fn(p, color) for p in identity]
        ident = jnp.concatenate(list(identity_maps), -1)
        if avg_reprojection:
            ident_min = jnp.mean(ident, axis=-1, keepdims=True)
        else:
            ident_min = jnp.min(ident, axis=-1, keepdims=True)
        noise = jax.random.normal(rng, ident_min.shape,
                                  ident_min.dtype) * 1e-5
        mask = automask(reproj_min, ident_min + noise)

    reproj = jnp.sum(reproj_min * mask) / (jnp.sum(mask) + 1e-7)
    sm = normalized_smooth_loss(
        disp, color if smooth_color is None else smooth_color)
    total = reproj + smoothness_weight * sm
    return MonoLossOut(total, reproj, sm, reproj_min)


class MultiLossOut(NamedTuple):
    loss: Array             # scalar "original" loss (reproj+consistency+smooth)
    distil_loss: Array      # scalar distillation loss
    reproj_loss: Array
    consistency_loss: Array
    smooth: Array
    consistency_mask: Array  # (B, H, W, 1) 1 where consistency applies


def multi_losses(
    disp: Array,                 # (B, H, W, 1) student disparity (full-res)
    color: Array,                # (B, H, W, 3) target frame
    warped: Sequence[Array],     # student-warped adjacent frames
    multi_depth: Array,          # (B, H, W, 1) student depth
    mono_depth: Array,           # (B, H, W, 1) teacher depth (caller detaches)
    consistency_mask_in: Array,  # (B, H, W) cost-volume confidence x matching mask
    augmentation_mask: Array,    # (B, 1, 1, 1) 1 where matching was augmented
    mono_min_reproj: Array,      # (B, H, W, 1) from mono_losses
    syn: Sequence[Array] = (),   # MAL temporal hint (main_temporal)
    ensemble_min_reproj: Array | None = None,  # (B, H, W, 1) or None
    ensemble_depth: Array | None = None,
    dual_distil_mono_depth: Array | None = None,  # non-detached teacher depth
    smoothness_weight: float = 1e-3,
    reproj_fn=reprojection_loss,
    selec_reproj: bool = False,
    avg_reprojection: bool = False,
    reproj_maps: Sequence[Array] | None = None,
    smooth_color: Array | None = None,
) -> MultiLossOut:
    """Student losses + MAL distillation hint.

    Reference: `manydepth/loss_utils.py:131-281`. The reprojection mask is the
    cost-volume consistency mask times (1 - augmentation mask); its complement
    gates the teacher-consistency loss; the distillation target is the
    per-pixel argmin over {mono, ensemble, multi} reprojection errors (which
    stays an argmin under `avg_reprojection` — only the per-frame source
    reduction averages, per the monodepth2 semantics).
    `reproj_maps` / `smooth_color` as in `mono_losses` (zero_img path).
    """
    if reproj_maps is None:
        reproj_maps = [reproj_fn(p, color) for p in list(warped) + list(syn)]
    reproj_all = jnp.concatenate(list(reproj_maps), axis=-1)
    if avg_reprojection:
        multi_min_reproj = jnp.mean(reproj_all, axis=-1, keepdims=True)
    elif selec_reproj and not syn:
        multi_min_reproj = apply_selec_reproj(reproj_all, list(warped))
    else:
        multi_min_reproj = jnp.min(reproj_all, axis=-1, keepdims=True)

    mask = consistency_mask_in[..., None] * (1.0 - augmentation_mask)
    consistency_mask = 1.0 - mask

    reproj = jnp.sum(multi_min_reproj * mask) / (jnp.sum(mask) + 1e-7)

    consistency = jnp.mean(jnp.abs(multi_depth - mono_depth) * consistency_mask)

    sm = normalized_smooth_loss(
        disp, color if smooth_color is None else smooth_color)
    loss = reproj + consistency + smoothness_weight * sm

    # --- distillation hint ---
    if ensemble_min_reproj is None:
        all_reproj = jnp.concatenate([mono_min_reproj, multi_min_reproj], -1)
        idx = jnp.argmin(all_reproj, axis=-1, keepdims=True)
        mono_term = dual_distil_mono_depth if dual_distil_mono_depth is not None else mono_depth
        distil_depth = jnp.where(idx == 0, mono_term, multi_depth)
    else:
        all_reproj = jnp.concatenate(
            [mono_min_reproj, ensemble_min_reproj, multi_min_reproj], -1)
        idx = jnp.argmin(all_reproj, axis=-1, keepdims=True)
        if ensemble_depth is None:
            ensemble_depth = (mono_depth + multi_depth) / 2.0
        distil_depth = jnp.where(idx == 0, mono_depth, ensemble_depth)
        distil_depth = jnp.where(idx == 2, multi_depth, distil_depth)

    distil = jnp.mean(jnp.abs(distil_depth - multi_depth) * (1.0 - consistency_mask))

    return MultiLossOut(loss, distil, reproj, consistency, sm, consistency_mask)


def matching_mask(mono_depth: Array, lowest_cost_disp: Array) -> Array:
    """Mask where the argmin-cost depth and the teacher agree within 2x.

    mono_depth: (B, H, W, 1); lowest_cost_disp: (B, H, W) full-res.
    Reference: `manydepth/trainer.py:1066-1076`.
    """
    matching_depth = 1.0 / lowest_cost_disp[..., None]
    m = ((matching_depth - mono_depth) / mono_depth) < 1.0
    m &= ((mono_depth - matching_depth) / matching_depth) < 1.0
    return m[..., 0].astype(mono_depth.dtype)


# ---------------------------------------------------------------------------
# Automatic two-term loss re-balancing (functional)
# ---------------------------------------------------------------------------

class LossBalancerState(NamedTuple):
    """Device-resident state for the ECCV'20-style 2-loss re-balancer.

    Replaces the host-side numpy `LossBalancing` class
    (`manydepth/loss_utils.py:283-345`); the running per-loss sums implement
    the reference's cumulative within-epoch mean over `train_scores`.
    """
    w: Array            # (2,) loss weights
    running_sum: Array  # (2,) cumulative per-loss sums this epoch
    count: Array        # () number of iterations accumulated
    prev_total: Array   # () previous weighted total loss
    prev_mean: Array    # (2,) previous per-loss cumulative means
    initialized: Array  # () bool

    @classmethod
    def create(cls) -> "LossBalancerState":
        return cls(
            w=jnp.array([0.5, 0.5], jnp.float32),
            running_sum=jnp.zeros(2, jnp.float32),
            count=jnp.zeros((), jnp.float32),
            prev_total=jnp.zeros((), jnp.float32),
            prev_mean=jnp.zeros(2, jnp.float32),
            initialized=jnp.zeros((), bool),
        )

    def reset_epoch(self) -> "LossBalancerState":
        return self._replace(running_sum=jnp.zeros(2, jnp.float32),
                             count=jnp.zeros((), jnp.float32))


class MultiLossManagerState(NamedTuple):
    """Functional N-loss rebalancer (`manydepth/multilossmanager.py:6-88` —
    the ECCV'20 multi-loss rebalancing algorithm with an explicit
    `rebalancing` cadence; the shipped MAL path uses the 2-loss
    `LossBalancerState` variant instead, but this is the general component).

    The reference buffers every per-iteration loss only to take its mean at
    rebalance time; the running sum/count is the same statistic in O(1)
    memory.
    """
    w: Array            # (N,) loss weights
    running_sum: Array  # (N,) per-loss sums since the last rebalance
    count: Array        # ()
    prev_total: Array   # ()
    prev_mean: Array    # (N,)
    initialized: Array  # () bool

    @classmethod
    def create(cls, num_losses: int) -> "MultiLossManagerState":
        return cls(
            w=jnp.full((num_losses,), 1.0 / num_losses, jnp.float32),
            running_sum=jnp.zeros(num_losses, jnp.float32),
            count=jnp.zeros((), jnp.float32),
            prev_total=jnp.zeros((), jnp.float32),
            prev_mean=jnp.zeros(num_losses, jnp.float32),
            initialized=jnp.zeros((), bool),
        )


def multi_loss_total(state: MultiLossManagerState, loss_list: Array):
    """Weighted sum + accumulated statistics (`get_total_loss`)."""
    total = jnp.sum(state.w * loss_list)
    stats = jax.lax.stop_gradient(state.w * loss_list)
    return total, state._replace(running_sum=state.running_sum + stats,
                                 count=state.count + 1.0)


def multi_loss_rebalance(state: MultiLossManagerState, lambda_adjust,
                         update_once: bool = False) -> MultiLossManagerState:
    """`rebalancing`: init weights to equal contribution on the first call,
    then bounded multiplicative adjustment; resets the accumulation window."""
    mean = state.running_sum / jnp.maximum(state.count, 1.0)
    total = jnp.sum(mean * state.w)

    w_init = total * state.w / jnp.maximum(mean, 1e-12)

    ratio = (total / jnp.maximum(state.prev_total, 1e-12)) \
        * (state.prev_mean / jnp.maximum(mean, 1e-12))
    adjust = jnp.clip(1.0 + lambda_adjust * (ratio - 1.0), 0.5, 2.0)
    can_adjust = state.initialized & (state.prev_total > 0) \
        & jnp.logical_not(jnp.asarray(update_once) & state.initialized)
    w_adj = jnp.where(state.prev_total > 0, state.w * adjust, state.w)
    new_w = jnp.where(state.initialized,
                      jnp.where(can_adjust, w_adj, state.w), w_init)

    return MultiLossManagerState(
        w=new_w,
        running_sum=jnp.zeros_like(state.running_sum),
        count=jnp.zeros_like(state.count),
        prev_total=jnp.sum(mean * new_w),
        prev_mean=mean,
        initialized=jnp.ones((), bool),
    )


def loss_balance(state: LossBalancerState, loss_list: Array,
                 lambda_adjust: Array):
    """Weighted total + updated balancer state.

    loss_list: (2,) [original_loss, distil_loss] (already stop-gradient-safe:
    the weighted sum keeps gradients; the statistics use stopped values).
    lambda_adjust: scalar from the per-epoch schedule
    max(start + epoch*slope, min) (`manydepth/trainer.py:458`).
    """
    total = state.w[0] * loss_list[0] + state.w[1] * loss_list[1]

    stats = jax.lax.stop_gradient(loss_list)
    running = state.running_sum + stats
    count = state.count + 1.0
    mean = running / count
    cur_total = jnp.sum(mean * state.w)

    # first call: initialize weights so each term contributes 1/2
    w_init = cur_total * 0.5 / jnp.maximum(mean, 1e-12)

    # subsequent: multiplicative bounded adjustment
    ratio = jnp.where(state.prev_total > 0,
                      (cur_total / jnp.maximum(state.prev_total, 1e-12))
                      * (state.prev_mean / jnp.maximum(mean, 1e-12)),
                      jnp.ones_like(mean))
    adjust = jnp.clip(1.0 + lambda_adjust * (ratio - 1.0), 0.5, 2.0)
    w_adj = jnp.where(state.prev_total > 0, state.w * adjust, state.w)

    new_w = jnp.where(state.initialized, w_adj, w_init)
    new_state = LossBalancerState(
        w=new_w,
        running_sum=running,
        count=count,
        prev_total=jnp.sum(mean * new_w),
        prev_mean=mean,
        initialized=jnp.ones((), bool),
    )
    return total, new_state
