"""Mask2Former training criterion: Hungarian set matching + point-sampled
mask losses.

Re-design of the reference's training-only stack — `mask2former/modeling/
matcher.py:70-179` (HungarianMatcher) and `mask2former/modeling/
criterion.py:90-247` (SetCriterion) — the two components MAL itself never
executes (it freezes the segmenter) but which complete the Mask2Former
model family: with these, the segmenter can be fine-tuned end-to-end on
TPU.

TPU-first shape discipline: the reference carries ragged per-image target
lists and ships each cost matrix to the host for scipy's
linear_sum_assignment (`matcher.py:149-151`, a device sync per image per
decoder layer). Here targets are padded to a static `T` with a validity
mask, the assignment is the on-device O(N^3) Jonker-Volgenant solve from
`segment/matcher.py` (vmapped over the batch), and the point-sampled
losses run at fixed point counts, so the whole criterion jits into the
training step with zero host round-trips.

Faithfulness notes (all checked against the reference source):
- matcher costs: class = -softmax prob of the target label
  (`matcher.py:105-111`); mask = per-point sigmoid BCE summed against
  target on/off (`:38-62`); dice with +1/+1 smoothing (`:15-30`); all on
  `num_points` shared random points sampled per image (`:119-132`).
- losses: weighted CE over all queries with `eos_coef` on the no-object
  class (`criterion.py:122-138`, torch's weighted-mean semantics); mask
  BCE + dice on `num_points` importance-sampled points
  (`criterion.py:140-190`) with PointRend's
  get_uncertain_point_coords_with_randomness (uncertainty = -|logit|,
  `criterion.py:73-87`), normalized by the global matched-pair count
  clamped to 1 (`criterion.py:224-231`).
- deep supervision: the same losses per intermediate decoder layer with
  independent matching (`criterion.py:239-245`), keys suffixed `_{i}`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mal_tpu.segment.matcher import hungarian_match

Array = jax.Array


class CriterionConfig(NamedTuple):
    """Hyper-parameters, defaults = the reference's `mask2former/config.py`
    (`:34-37` weights, `:108-114` point sampling)."""

    num_classes: int = 80
    eos_coef: float = 0.1
    cost_class: float = 1.0
    cost_mask: float = 20.0
    cost_dice: float = 1.0
    num_points: int = 112 * 112
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75


def point_sample(masks: Array, coords: Array) -> Array:
    """Bilinear point sampling with torch grid_sample semantics
    (align_corners=False, zero padding) — detectron2 point_rend's
    `point_sample` as the reference criterion calls it
    (`criterion.py:171-181`).

    masks: (..., H, W); coords: (..., P, 2) in [0, 1], (x, y) order with x
    along W. Returns (..., P).
    """
    H, W = masks.shape[-2], masks.shape[-1]
    px = coords[..., 0] * W - 0.5
    py = coords[..., 1] * H - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def corner(yi, xi):
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = masks.reshape(*masks.shape[:-2], H * W)
        v = jnp.take_along_axis(flat, yc * W + xc, axis=-1)
        return jnp.where(inb, v, 0.0)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _bce_with_logits(x: Array, z: Array) -> Array:
    # numerically-stable binary_cross_entropy_with_logits
    return jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


def match_cost_matrix(logits: Array, mask_pts: Array, tgt_labels: Array,
                      tgt_pts: Array, cfg: CriterionConfig) -> Array:
    """Per-image matching cost (Q, T) — `matcher.py:105-148`.

    logits (Q, K+1); mask_pts (Q, P) pred-mask logits at the shared points;
    tgt_labels (T,); tgt_pts (T, P) binary target values at the same points.
    """
    P = mask_pts.shape[-1]
    prob = jax.nn.softmax(logits, axis=-1)                 # (Q, K+1)
    cost_class = -prob[:, tgt_labels]                      # (Q, T)

    pos = _bce_with_logits(mask_pts, jnp.ones_like(mask_pts))
    neg = _bce_with_logits(mask_pts, jnp.zeros_like(mask_pts))
    cost_mask = (pos @ tgt_pts.T + neg @ (1.0 - tgt_pts).T) / P

    sig = jax.nn.sigmoid(mask_pts)
    numer = 2.0 * (sig @ tgt_pts.T)
    denom = sig.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    cost_dice = 1.0 - (numer + 1.0) / (denom + 1.0)

    return (cfg.cost_mask * cost_mask + cfg.cost_class * cost_class
            + cfg.cost_dice * cost_dice)


def match_one(cost: Array, valid: Array) -> Array:
    """Assign each (padded) target a distinct query minimizing total cost.

    cost (Q, T) with Q >= T; valid (T,) bool. Returns src (T,) int32 —
    the matched query per target column. Rectangular LSA via a square
    embed: invalid/dummy columns get constant cost 0, which cannot change
    the optimum over the real columns (each row is used at most once and
    constant columns add the same total under any completion).
    """
    Q, T = cost.shape
    sq = jnp.zeros((Q, Q), cost.dtype)
    sq = sq.at[:, :T].set(jnp.where(valid[None, :], cost, 0.0))
    row_of_col = hungarian_match(sq)                       # (Q,)
    return row_of_col[:T].astype(jnp.int32)


def _uncertain_point_coords(key: Array, mask_logits: Array,
                            cfg: CriterionConfig,
                            oversample_coords: Array | None = None,
                            rand_coords: Array | None = None) -> Array:
    """PointRend importance sampling — detectron2
    `get_uncertain_point_coords_with_randomness` with uncertainty =
    -|logit| (`criterion.py:73-87,161-169`). mask_logits: (N, H, W).
    Returns (N, num_points, 2). The two optional coord overrides replace
    the uniform draws (oracle tests inject torch's)."""
    N = mask_logits.shape[0]
    n_sampled = int(cfg.num_points * cfg.oversample_ratio)
    n_unc = int(cfg.importance_sample_ratio * cfg.num_points)
    n_rand = cfg.num_points - n_unc

    k1, k2 = jax.random.split(key)
    if oversample_coords is None:
        oversample_coords = jax.random.uniform(k1, (N, n_sampled, 2))
    pl = point_sample(mask_logits, oversample_coords)      # (N, n_sampled)
    uncertainty = -jnp.abs(pl)
    _, idx = jax.lax.top_k(uncertainty, n_unc)             # (N, n_unc)
    coords = jnp.take_along_axis(oversample_coords, idx[..., None], axis=1)
    if n_rand > 0:
        if rand_coords is None:
            rand_coords = jax.random.uniform(k2, (N, n_rand, 2))
        coords = jnp.concatenate([coords, rand_coords], axis=1)
    return coords


def set_criterion(key: Array, pred_logits: Array, pred_masks: Array,
                  tgt_labels: Array, tgt_masks: Array, tgt_valid: Array,
                  cfg: CriterionConfig = CriterionConfig(),
                  match_coords: Array | None = None,
                  loss_oversample_coords: Array | None = None,
                  loss_rand_coords: Array | None = None,
                  num_masks: Array | None = None) -> dict[str, Array]:
    """Full SetCriterion for one set of predictions (`criterion.py:212-247`
    minus the aux loop — see `set_criterion_deep` for deep supervision).

    pred_logits (B, Q, K+1); pred_masks (B, Q, H, W) logits;
    tgt_labels (B, T) int; tgt_masks (B, T, Ht, Wt) binary float;
    tgt_valid (B, T) bool. Returns {"loss_ce", "loss_mask", "loss_dice"}
    (unweighted — apply `weight_dict` outside like
    `maskformer_model.py:210-216`).

    `num_masks`: global matched-pair normalizer; defaults to this batch's
    valid count (pass the `psum` over the data axis for exact
    multi-host/DP parity with `criterion.py:229-231`).
    """
    B, Q, K1 = pred_logits.shape
    T = tgt_labels.shape[1]
    km, kl = jax.random.split(key)

    # --- matching (no gradients, `matcher.py:95`) ---
    if match_coords is None:
        match_coords = jax.random.uniform(km, (B, cfg.num_points, 2))
    pl = jax.lax.stop_gradient(pred_masks)
    pred_pts = point_sample(
        pl.reshape(B * Q, *pl.shape[2:]),
        jnp.repeat(match_coords, Q, axis=0)).reshape(B, Q, -1)
    tgt_pts_m = point_sample(
        tgt_masks.reshape(B * T, *tgt_masks.shape[2:]),
        jnp.repeat(match_coords, T, axis=0)).reshape(B, T, -1)
    cost = jax.vmap(match_cost_matrix, in_axes=(0, 0, 0, 0, None))(
        jax.lax.stop_gradient(pred_logits), pred_pts, tgt_labels,
        tgt_pts_m, cfg)
    src = jax.vmap(match_one)(cost, tgt_valid)             # (B, T)

    if num_masks is None:
        num_masks = tgt_valid.sum()
    num_masks = jnp.maximum(num_masks.astype(jnp.float32), 1.0)

    # --- loss_ce (`criterion.py:122-138`): weighted-mean CE over all
    # queries; matched queries get the target label, everything else the
    # no-object class. Invalid (padded) targets scatter no-object into
    # their (distinct, arbitrary) matched rows — a no-op.
    scatter_lab = jnp.where(tgt_valid, tgt_labels, cfg.num_classes)
    target_classes = jnp.full((B, Q), cfg.num_classes, jnp.int32)
    target_classes = jax.vmap(
        lambda tc, s, l: tc.at[s].set(l))(target_classes, src, scatter_lab)
    logp = jax.nn.log_softmax(pred_logits, axis=-1)        # (B, Q, K+1)
    nll = -jnp.take_along_axis(logp, target_classes[..., None],
                               axis=-1)[..., 0]            # (B, Q)
    w = jnp.where(target_classes == cfg.num_classes, cfg.eos_coef, 1.0)
    loss_ce = (w * nll).sum() / w.sum()

    # --- loss_mask / loss_dice (`criterion.py:140-190`) on matched pairs,
    # padded pairs masked out of the sums.
    matched_pred = jax.vmap(lambda m, s: m[s])(pred_masks, src)  # (B,T,H,W)
    mp = matched_pred.reshape(B * T, *matched_pred.shape[2:])
    tm = tgt_masks.reshape(B * T, *tgt_masks.shape[2:])
    pc = _uncertain_point_coords(
        kl, jax.lax.stop_gradient(mp), cfg,
        oversample_coords=loss_oversample_coords,
        rand_coords=loss_rand_coords)                      # (B*T, P, 2)
    point_logits = point_sample(mp, pc)                    # (B*T, P)
    point_labels = jax.lax.stop_gradient(point_sample(tm, pc))
    vflat = tgt_valid.reshape(B * T).astype(point_logits.dtype)

    ce = _bce_with_logits(point_logits, point_labels).mean(-1)   # (B*T,)
    loss_mask = (ce * vflat).sum() / num_masks

    sig = jax.nn.sigmoid(point_logits)
    numer = 2.0 * (sig * point_labels).sum(-1)
    denom = sig.sum(-1) + point_labels.sum(-1)
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    loss_dice = (dice * vflat).sum() / num_masks

    return {"loss_ce": loss_ce, "loss_mask": loss_mask,
            "loss_dice": loss_dice}


def set_criterion_deep(key: Array, pred_logits: Array, pred_masks: Array,
                       tgt_labels: Array, tgt_masks: Array, tgt_valid: Array,
                       cfg: CriterionConfig = CriterionConfig(),
                       num_masks: Array | None = None) -> dict[str, Array]:
    """Deep supervision (`criterion.py:239-245`): pred_logits (L, B, Q, K+1)
    and pred_masks (L, B, Q, H, W) with layer L-1 the final prediction.
    Returns the final losses plus `_{i}`-suffixed aux losses, reference
    naming."""
    L = pred_logits.shape[0]
    keys = jax.random.split(key, L)
    out = set_criterion(keys[L - 1], pred_logits[L - 1], pred_masks[L - 1],
                        tgt_labels, tgt_masks, tgt_valid, cfg,
                        num_masks=num_masks)
    for i in range(L - 1):
        aux = set_criterion(keys[i], pred_logits[i], pred_masks[i],
                            tgt_labels, tgt_masks, tgt_valid, cfg,
                            num_masks=num_masks)
        out.update({f"{k}_{i}": v for k, v in aux.items()})
    return out


def weight_dict(cfg: CriterionConfig, num_aux_layers: int) -> dict[str, float]:
    """`maskformer_model.py:118-125`: loss weights incl. per-aux-layer
    copies; apply by multiplying (`:210-216`)."""
    base = {"loss_ce": cfg.cost_class, "loss_mask": cfg.cost_mask,
            "loss_dice": cfg.cost_dice}
    out = dict(base)
    for i in range(num_aux_layers):
        out.update({f"{k}_{i}": v for k, v in base.items()})
    return out


def weighted_total(losses: dict[str, Array],
                   weights: dict[str, float]) -> Array:
    """Sum of weighted losses — the training objective
    (`maskformer_model.py:210-216`)."""
    return sum(losses[k] * w for k, w in weights.items() if k in losses)
