"""Configuration system.

A typed dataclass tree replacing the reference's four argparse option stacks
(`manydepth/options.py:13-456`, `dynamicdepth/options.py`,
`dualrefine/options.py`). Defaults mirror the reference training recipe:
batch 12, lr 1e-4, 20 epochs, 96 depth bins, 192x640, frames {0,-1,+1},
smoothness 1e-3 (`manydepth/options.py:50-109`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class Config:
    """Top-level configuration for training / evaluation.

    Frozen (hashable) so it can be closed over by jit'd functions as a static
    argument.
    """

    # --- model ---
    model_name: str = "mal"
    method: str = "manydepth"  # manydepth | dynamicdepth | dualrefine
    num_layers: int = 18
    height: int = 192
    width: int = 640
    num_depth_bins: int = 96
    depth_binning: str = "linear"  # linear | inverse | log
    min_depth: float = 0.1
    max_depth: float = 100.0
    pose_cnn: bool = False

    # --- frames ---
    # frame offsets used for the photometric loss; first must be 0.
    frame_ids: tuple[int, ...] = (0, -1, 1)
    num_matching_frames: int = 1
    use_future_frame: bool = False

    # --- training ---
    batch_size: int = 12
    learning_rate: float = 1e-4
    num_epochs: int = 20
    disparity_smoothness: float = 1e-3
    warmup_steps: int = 500
    decay_steps: int = 48000
    init_lr: float = 1e-10
    # scheduler selection (`manydepth/trainer.py:194-232`): "warmup_step"
    # (the default WarmupStepLRScheduler), "cos" (--cos,
    # CosineAnnealingWarmupRestarts — broken upstream, see lr_schedule.py),
    # "step" (--step_lr, torch StepLR stepped per epoch)
    lr_scheduler: str = "warmup_step"
    scheduler_step_size: int = 15  # --scheduler_step_size (epochs, "step")
    # steps per epoch for the per-epoch "step" scheduler; the trainer sets
    # it from len(train_loader) at build time (0 = unset)
    steps_per_epoch: int = 0
    # matching augmentation probabilities (static-camera / zero-cost-volume)
    # (`manydepth/networks/repdepth.py:279-293`)
    aug_static_camera_p: float = 0.25
    aug_zero_cost_volume_p: float = 0.25
    grad_clip_norm: float = 0.0   # optional global-norm clip (0 = off)
    disable_automasking: bool = False
    disable_motion_masking: bool = False
    no_matching_augmentation: bool = False
    freeze_teacher_and_pose: bool = False
    freeze_pose: bool = False

    # --- MAL hints ---
    distil: bool = True           # distillation hint
    use_ensemble: bool = True     # 3-way {mono, ensemble, multi} distillation
    dual_distil: bool = False     # distil toward non-detached mono depth
    learn_ens: bool = False       # --learn_ens: broken upstream (see step.py)
    loss_blc: bool = True         # automatic two-term loss re-balancing
    # --pareto (`manydepth/options.py:440`): MGDA min-norm gradient
    # re-weighting of (photometric, distil) instead of loss_blc; the
    # reference's pareto_fn module is missing from its snapshot — mal_tpu
    # ships a documented reconstruction (`mal_tpu/pareto.py`). Overrides
    # loss_blc like the reference's if/elif (`loss_utils.py:256-266`).
    pareto: bool = False
    pareto_c: tuple[float, float] = (0.1, 0.3)  # c_list (`loss_utils.py:258`)
    temporal: bool = False        # temporal hint (dynamic-object synthesis)
    main_temporal: bool = False
    # precomputed current-frame instance cache for the temporal hint
    # (`segment/cache.py` + `cli export-seg`): replaces one of the three
    # segmenter forwards per --temporal step with a bit-exact disk load;
    # None = reference behavior (segment the current frame online)
    seg_cache_root: str | None = None
    ins_threshold: float = 0.9    # instance score threshold for the
                                  # temporal hint (`manydepth/options.py:
                                  # 299-302` default)
    # static-shape cap on instances per image. The reference carries up to
    # 100 score-filtered queries (`manydepth/dyn_utils.py:140`,
    # `maskformer_model.py:361-380`); 16 covers busy Cityscapes frames
    # without truncation (tests/test_temporal.py::test_max_instances_no_
    # truncation) and the O(N^3) JV matcher scales to 32+
    # (segment/matcher.py). Step-time cost of 8 -> 16 measured in
    # benchmarks/HISTORY.md (round 5).
    max_instances: int = 16
    # whole-block Pallas Swin fusion for the frozen segmenter forward
    # (ops/pallas/swin_block.py; eval-only, parameter-tree identical).
    # None = auto: on for TPU fast mode, where it measured backbone
    # 78.8 -> 44.1 ms (benchmarks/bench_swin_fused.py); off for exact
    # fp32 and off-TPU backends (segment/mask2former.py:resolve_fused_swin)
    seg_fused_swin: bool | None = None
    # --no_ssim (`manydepth/trainer.py:318,1217`): pure-L1 photometric loss
    no_ssim: bool = False
    # --avg_reprojection: per-pixel mean over source frames instead of the
    # min. The reference parses it but its consumer is commented out
    # (`loss_utils.py:171`, `trainer.py:1299`); implemented here with the
    # monodepth2 semantics it inherits
    avg_reprojection: bool = False
    # --loss_pct (`manydepth/trainer.py:1337-1344`): log the fraction of
    # pixels that survive the reprojection-loss mask
    loss_pct: bool = False
    # loss-balancing lambda schedule (`manydepth/options.py:443-445`)
    lambda_for_adjust_start: float = 3.0
    lambda_for_adjust_slope: float = -1.5
    lambda_for_adjust_min: float = -3.0

    # --- depth-bin tracker ---
    adaptive_bins: bool = True
    depth_bin_ema: float = 0.99

    # --- precision / performance ---
    compute_dtype: str = "float32"   # float32 | bfloat16
    use_pallas: bool = True          # use Pallas kernels where available
    # MXU precision of the Pallas plane-sweep interpolation matmuls:
    # "highest" = exact fp32 parity (69 ms), "default" = bf16 (~1e-3 cost
    # error, 41 ms); see benchmarks/HISTORY.md.
    cv_mxu_precision: str = "highest"
    # DOMD z-buffer splat fast path (DynamicDepth): 1x splat + 3x3 max
    # dilation of the inverse-depth map instead of the reference's x3
    # NN-upsampled 9-subpoint splat (`rigid_warp.py:534-560`) — 1/9 the
    # scatter index count on the index-rate-bound TPU scatter. None = auto:
    # on for bf16 fast mode on TPU, off (exact) otherwise; see
    # dynamic/warp.py:splat_depth for the equivalence argument.
    domd_splat_dilate: bool | None = None
    remat: bool = False              # jax.checkpoint the loss pyramids

    # --- parallelism ---
    # data-axis width of the mesh; 0 = all remaining devices (the mesh axis
    # names "data"/"depth" are mal_tpu's internal contract — the in-model
    # sharding constraints in ops/cost_volume.py name them)
    num_data_shards: int = 0
    # >1: 2-D (data x depth) mesh; the cost volume's 96-plane axis shards
    # over the "depth" axis (SURVEY.md §5 — this domain's sequence
    # parallelism). Requires num_data_shards * num_depth_shards devices.
    num_depth_shards: int = 1

    # --- data ---
    dataset: str = "kitti"
    data_path: str = "../input"
    split: str = "eigen_zhou"
    eval_split: str = "eigen"
    png: bool = False
    num_workers: int = 8
    native_loader: bool = True    # threaded C++ decode + prefetch for train

    # --- dynamicdepth options (occlusion-aware cost volume / DOMD warp) ---
    # pool radius/threshold defaults follow the reference CLI defaults
    # (`dynamicdepth/options.py:312-319`), not the dead kwarg defaults in
    # `networks/resnet_encoder.py:281`.
    cv_min: bool = False
    cv_set_1: bool = False
    cv_pool: bool = False
    cv_pool_radius: int = 1
    cv_pool_th: float = 0.7
    no_warp: bool = False         # disable the DOMD warp entirely
    # --no_reproj_doj (`dynamicdepth/trainer.py:507-510,530-533,830-833`):
    # blank the forward-warped object pixels instead of pasting them (the
    # DOMD'd frames keep holes at BOTH the old and new object positions);
    # the cost-volume lookup paste is not gated (`:518-521`)
    no_reproj_doj: bool = False
    # mono-loss merge variants (`dynamicdepth/trainer.py:630-650`):
    # --tempv2 drops the teacher losses from the total; --no_multi_loss
    # REPLACES the student losses with the teacher's (`losses[key] = val`)
    tempv2: bool = False
    no_multi_loss: bool = False
    # reference default TRUE (`--no_teacher_warp` is store_false,
    # `dynamicdepth/options.py:337-339`): the mono identity preds come from
    # `ori_color` — frame -1 pristine, frame "+1" the MUTATED frame -1 (an
    # upstream copy-paste: `trainer.py:528-529` clones color[-1] for
    # ori_color[+1] after the -1 mutation) — instead of the DOMD'd frames
    no_teacher_warp: bool = True
    # feature-metric loss family (`dynamicdepth/options.py:142-154`,
    # `trainer.py:1123-1156`)
    feat_loss: bool = False
    feat_dis: float = 0.01
    feat_cvt: float = 0.01
    # reprojection variants + teacher-only training
    # (`dynamicdepth/options.py:298-303`, `trainer.py:138-141,955-963,1058-1065`)
    selec_reproj: bool = False
    zero_img: bool = False
    train_teacher_only: bool = False
    # generate doj masks online with the frozen Mask2Former instead of
    # loading precomputed .npy files (mal_tpu extension — the reference
    # ships no mask-generation tooling; see segment/doj.py)
    online_doj: bool = False

    # --- dualrefine options (DEQ refinement) ---
    # defaults mirror `dualrefine/options.py:142-230`
    deq_solver: str = "anderson"  # --f_solver: anderson | iteration
    deq_stop_mode: str = "abs"    # --stop_mode: abs | rel (lowest-iterate pick)
    deq_iters: int = 6            # --f_thres
    # freeze schedule (`dualrefine/options.py:118-135`, trainer.py:207-213):
    # at freeze_teacher_epoch only the refinement student (conv2 / context /
    # hidden / update_block) keeps training
    freeze_teacher_epoch: int = 15
    deq_eval_factor: float = 1.0  # --eval_factor
    corr_radius: int = 8
    corr_levels: int = 3          # --num_levels
    # --num_cost_volume_head (`dualrefine/options.py:142-145`,
    # `depth_pose.py:435`, `update.py:90`): channel groups in the epipolar
    # cost; the motion encoder's input widens accordingly
    num_cost_volume_head: int = 1
    num_pose_iter: int = 1
    # GN pose-update ablations (`dualrefine/options.py`):
    # --disable_pose_updates skips the Gauss-Newton loop entirely
    # (`depth_pose.py:449-456`); --disable_evolving_pose_weight drops the
    # per-iteration weight head (weight=None, `depth_pose.py:444-447`);
    # --disable_fixed_pose_weight replaces the learned uncertainty weights
    # with ones (`utils/utils.py:291-298`); --disable_wnorm drops weight
    # normalization from the update block (`depth_pose.py:65-66`)
    disable_pose_updates: bool = False
    disable_evolving_pose_weight: bool = False
    disable_fixed_pose_weight: bool = False
    disable_wnorm: bool = False
    # --Pose_for_consistency_mask (`dualrefine/options.py:92-94`,
    # `depth_pose.py:553-556`): which pose sweeps the consistency-mask
    # epipolar bins — "Tstar" (refined, default) or "T0" (initial)
    pose_for_consistency_mask: str = "Tstar"
    gap_factor_depth_ratio: int = 8
    phantom_grad_steps: int = 1   # --phantom_grad
    deq_tau: float = 1.0
    deq_ift: bool = False         # --ift: IFT backward instead of phantom
    deq_safe_ift: bool = False    # --safe_ift: freeze a diverging adjoint
    deq_b_thres: int = 6          # --b_thres: adjoint solve iterations
    deq_sup_all: bool = False     # --sup_all: supervise every phantom step
    deq_indexing: tuple[int, ...] = ()  # --indexing: trajectory tap points
    robust_pose_loss: bool = False  # --robust_pose_loss: Barron GN weights
    # --n_losses: supervise N uniformly-spaced trajectory states (fixed-point
    # correction, `depth_pose.py:491-500`); 1 = final state only (default)
    deq_n_losses: int = 1

    # --- logging / checkpointing ---
    log_every: int = 50
    validate_every: int = 1000
    # >0: at each validation, write this many plasma-colormapped disparity
    # PNGs to {ckpt_dir}/images (+ wandb images when a run is active) —
    # the reference's dormant TB image path (`manydepth/trainer.py:
    # 1533-1585`) as a working sink (utils/vis.py:dump_disp_images)
    log_disp_images: int = 0
    # --validate_from (`manydepth/trainer.py:514`): periodic validation only
    # after this many steps (the step-250 early validate is unaffected)
    validate_from: int = 0
    # --save_until (`manydepth/trainer.py:536`): checkpoints are written only
    # from this step on (despite the name — the reference gates with >=)
    save_until: int = 0
    # --save_frequency (`dualrefine/trainer.py:219`): epochs between
    # end-of-epoch checkpoint saves. Parsed by every reference stack but only
    # the DualRefine trainer consumes it; ManyDepth/DynamicDepth save at
    # validation steps — matched here (applies to method="dualrefine").
    save_frequency: int = 1
    ckpt_dir: str = "./ckpt"

    @property
    def frames_to_load(self) -> tuple[int, ...]:
        out = list(self.frame_ids)
        for idx in range(-1, -1 - self.num_matching_frames, -1):
            if idx not in out:
                out.append(idx)
        return tuple(out)

    @property
    def matching_ids(self) -> tuple[int, ...]:
        out = [0]
        if self.use_future_frame:
            out.append(1)
        for idx in range(-1, -1 - self.num_matching_frames, -1):
            out.append(idx)
        return tuple(out)

    @property
    def num_scales(self) -> int:
        return 1  # the reference decoder emits a single full-res disparity

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        field_names = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in field_names}
        for k in ("frame_ids", "pareto_c", "deq_indexing"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d)


# TPU fast-training mode: bf16 conv trunks + bf16 MXU cost-volume matmuls.
# Measured on v5e at 192x640/batch 12 (benchmarks/HISTORY.md): 345 -> 250
# ms/step (34.8 -> 48.0 fps) with identical first-step loss to 4 decimals.
# Training entry points (cli train, bench.py) apply these by default; the
# bare Config stays fp32/"highest" so eval and parity tests are exact.
TRAIN_FAST_SETTINGS = {
    "compute_dtype": "bfloat16",
    "cv_mxu_precision": "default",
}


# Dataset presets, mirroring the trainer's option mutation
# (`manydepth/trainer.py:129-142`).
KITTI = Config()
CITYSCAPES = Config(
    dataset="cityscapes_preprocessed", height=192, width=512,
    split="cityscapes_preprocessed", eval_split="cityscapes",
)
DDAD = Config(dataset="ddad", height=384, width=640, split="ddad", eval_split="ddad")

PRESETS = {"kitti": KITTI, "cityscapes": CITYSCAPES, "ddad": DDAD}
