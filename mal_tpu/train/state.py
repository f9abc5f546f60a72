"""Training state: parameters, BN stats, optimizer, depth-bin tracker,
loss-balancer — one pytree, checkpointable with orbax.

The depth-bin tracker is the functional equivalent of the reference's
torchmetrics `DepthBins` metric (`manydepth/trainer.py:75-103`): an EMA over
per-step global-batch min/max teacher depth, with the cross-device reduction
done by the caller (mean over the global batch happens automatically under
pjit data sharding).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import flax
import jax
import jax.numpy as jnp
import optax

from mal_tpu.config import Config
from mal_tpu.losses import LossBalancerState
from mal_tpu.train.lr_schedule import warmup_step_schedule

Array = jax.Array


class DepthBinTracker(NamedTuple):
    min_depth: Array   # ()
    max_depth: Array   # ()
    updated: Array     # () bool — mirror of `DepthBins.updated`
    # DualRefine additionally tracks mean/median EMAs
    # (`dualrefine/trainer.py:82-83,357-372`). They are write-only state in
    # the reference (stored + checkpointed, never consumed by the model) but
    # its checkpoint format carries them, so track them exactly rather than
    # approximating at export time.
    mean_depth: Array    # (), init 1.0
    median_depth: Array  # (), init 1.0

    @classmethod
    def create(cls, min_depth: float = 0.1, max_depth: float = 10.0):
        return cls(jnp.asarray(min_depth, jnp.float32),
                   jnp.asarray(max_depth, jnp.float32),
                   jnp.zeros((), bool),
                   jnp.ones((), jnp.float32),
                   jnp.ones((), jnp.float32))

    def update(self, mono_depth: Array, opt_min_depth: float,
               ema: float = 0.99, track_stats: bool = False
               ) -> "DepthBinTracker":
        """mono_depth: (B, H, W, 1) teacher depth for the *global* batch.

        `track_stats` adds the DualRefine mean/median EMAs, reproducing the
        reference's quirks exactly (`dualrefine/trainer.py:357-363`): the
        mean reduces ONLY batch element 0 (`.mean(-1)[0]` indexes the batch
        after the reduction collapses the tuple-free mean), while the median
        is a median-of-row-medians averaged over the batch, with torch's
        lower-middle median for even lengths."""
        per_img_min = jnp.min(mono_depth, axis=(1, 2, 3))
        per_img_max = jnp.max(mono_depth, axis=(1, 2, 3))
        mn = jnp.maximum(opt_min_depth, jnp.mean(per_img_min) * 0.9)
        mx = jnp.mean(per_img_max) * 1.1
        mean_d, median_d = self.mean_depth, self.median_depth
        if track_stats:
            d = mono_depth[..., 0]                        # (B, H, W)
            new_mean = jnp.mean(d[0])
            # torch .median picks sorted[(n-1)//2]: quantile 'lower'
            row_med = jnp.quantile(d, 0.5, axis=-1, method="lower")  # (B, H)
            new_median = jnp.mean(
                jnp.quantile(row_med, 0.5, axis=-1, method="lower"))
            mean_d = mean_d * ema + new_mean * (1.0 - ema)
            median_d = median_d * ema + new_median * (1.0 - ema)
        return DepthBinTracker(
            min_depth=self.min_depth * ema + mn * (1.0 - ema),
            max_depth=self.max_depth * ema + mx * (1.0 - ema),
            updated=jnp.ones((), bool),
            mean_depth=mean_d,
            median_depth=median_d,
        )

    def load(self, min_depth, max_depth, mean_depth=None,
             median_depth=None) -> "DepthBinTracker":
        def _f(v, fallback):
            return (fallback if v is None
                    else jnp.asarray(v, jnp.float32).reshape(()))
        return DepthBinTracker(
            _f(min_depth, self.min_depth),
            _f(max_depth, self.max_depth),
            jnp.ones((), bool),
            _f(mean_depth, self.mean_depth),
            _f(median_depth, self.median_depth))


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    bins: DepthBinTracker
    balancer: LossBalancerState


def sanitize_grads() -> optax.GradientTransformation:
    """Replace non-finite gradient entries with 0.

    Degenerate projective samples (points on the camera plane) can produce
    gradient spikes above ~1.8e19, whose square overflows Adam's second
    moment to inf and poisons the parameters with NaN. The reference avoids
    the regime only by always starting from pretrained weights
    (`README.md:22` --load_pretrained); this guard makes from-scratch and
    synthetic-data training robust with zero effect on healthy steps.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


# DualRefine's refinement student modules (`depth_pose.py:84-87`
# freeze_backbone keeps exactly these trainable)
DUALREF_STUDENT = ("conv2", "context", "hidden", "update_block")


def make_optimizer(cfg: Config,
                   freeze_backbone: bool = False) -> optax.GradientTransformation:
    """`freeze_backbone=True` (DualRefine freeze_teacher_epoch phase) trains
    only the refinement student; everything else is zeroed."""
    if cfg.lr_scheduler == "step":
        # torch StepLR per epoch (`dualrefine/trainer.py:104-105`,
        # manydepth --step_lr); Trainer resolves steps_per_epoch from
        # len(train_loader) when unset
        from mal_tpu.train.lr_schedule import step_lr_schedule
        schedule = step_lr_schedule(cfg.learning_rate,
                                    cfg.scheduler_step_size,
                                    cfg.steps_per_epoch)
    elif cfg.lr_scheduler == "warmup_step":
        schedule = warmup_step_schedule(cfg.init_lr, cfg.learning_rate,
                                        cfg.warmup_steps, cfg.decay_steps)
    else:
        # --cos selects CosineAnnealingWarmupRestarts, whose import is
        # absent from the reference snapshot (`manydepth/trainer.py:194`
        # imports `lr_scheduler.CosineAnnealingWarmupRestarts`, not
        # defined in its lr_scheduler.py) — broken upstream
        raise NotImplementedError(
            f"lr_scheduler={cfg.lr_scheduler!r}: only 'warmup_step' and "
            "'step' exist ('cos' is broken in the reference snapshot — "
            "the class it imports is missing)")
    chain = [sanitize_grads()]
    if getattr(cfg, "grad_clip_norm", 0.0):
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.adam(schedule))
    tx = optax.chain(*chain)

    if freeze_backbone:
        def label_bb(params):
            return {k: ("train" if k in DUALREF_STUDENT else "frozen")
                    for k in params.keys()}
        return optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_bb)

    frozen: list[str] = []
    if cfg.freeze_teacher_and_pose:
        frozen += ["mono_encoder", "mono_depth", "pose_encoder", "pose"]
    elif cfg.freeze_pose:
        frozen += ["pose_encoder", "pose"]
    if getattr(cfg, "train_teacher_only", False):
        # student (cost-volume encoder + decoder) excluded from training
        # (`dynamicdepth/trainer.py:138-141`)
        frozen += ["encoder", "depth", "reduce_conv"]
    if frozen:
        def label_fn(params):
            return {k: ("frozen" if k in frozen else "train")
                    for k in params.keys()}
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx


def create_train_state(cfg: Config, model, rng: Array,
                       sample_inputs: dict) -> TrainState:
    init_rng, aug_rng = jax.random.split(rng)
    if cfg.method == "dualrefine":
        variables = model.init(
            {"params": init_rng}, sample_inputs["color_aug"]["0"],
            sample_inputs["color_aug"]["-1"], sample_inputs["K"],
            invert=True, train=True)
    else:
        variables = model.init(
            {"params": init_rng}, sample_inputs,
            jnp.asarray(0.1), jnp.asarray(10.0), aug_rng, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        bins=DepthBinTracker.create(),
        balancer=LossBalancerState.create(),
    )
