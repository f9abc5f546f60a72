"""Host-side training orchestration.

The thin loop around the jit step, replacing
`manydepth/trainer.py:119-1730`: dataset/loader construction, the device
mesh, metric logging, the step-250 early validation and periodic full
validation (`trainer.py:498-537`), and checkpointing. All numerical work
lives in `mal_tpu.train.step`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu.config import Config
from mal_tpu.data.mono_dataset import DataLoader
from mal_tpu.eval.evaluate import evaluate_depth_maps, infer_disparities
from mal_tpu.models import MALModel
from mal_tpu.parallel import data_parallel_step, make_mesh, replicate, shard_batch
from mal_tpu.train.state import TrainState, create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step
from mal_tpu.utils.checkpoint import save_checkpoint
from mal_tpu.utils.misc import sec_to_hm_str


class MetricLogger:
    """Console / callback logger (wandb-compatible dict stream)."""

    def __init__(self, sink: Callable[[dict, int], None] | None = None):
        self.sink = sink
        self.history: list[tuple[int, dict]] = []

    def log(self, metrics: dict, step: int):
        scalars = {k: float(v) for k, v in metrics.items()}
        self.history.append((step, scalars))
        if self.sink is not None:
            self.sink(scalars, step)
        else:
            parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items()))
            print(f"[step {step}] {parts}", flush=True)


def _default_sink(cfg: Config):
    """Default observability: console + JSONL under ckpt_dir, plus wandb when
    the environment is set up for it (the reference's primary sink,
    `manydepth/trainer.py:110,472-492` — project `plug_many`)."""
    from mal_tpu.utils.logging import (console_sink, jsonl_sink, multi_sink,
                                       wandb_sink)

    sinks = [console_sink]
    if cfg.ckpt_dir:
        try:
            sinks.append(jsonl_sink(os.path.join(cfg.ckpt_dir, "metrics.jsonl")))
        except OSError:
            pass
    if os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE"):
        try:
            sinks.append(wandb_sink(name=cfg.model_name,
                                    config=json.loads(cfg.to_json())))
        except Exception as e:  # wandb missing/offline — keep training
            print(f"wandb sink disabled: {e}", flush=True)
    return multi_sink(*sinks)


class Trainer:
    def __init__(self, cfg: Config, train_loader: DataLoader | Iterable,
                 val_batches: list | None = None,
                 gt_depths: list | None = None,
                 logger: MetricLogger | None = None,
                 num_devices: int | None = None,
                 seed: int = 0,
                 seg_variables=None):
        assert cfg.height % 32 == 0 and cfg.width % 32 == 0
        if cfg.lr_scheduler == "step" and cfg.steps_per_epoch == 0:
            # the per-epoch StepLR schedule needs the epoch length in steps;
            # resolve it from the loader (config.py steps_per_epoch doc)
            try:
                cfg = cfg.replace(steps_per_epoch=len(train_loader))
            except TypeError:
                raise ValueError(
                    "lr_scheduler='step' with an unsized train_loader: set "
                    "Config.steps_per_epoch explicitly") from None
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_batches = val_batches
        self.gt_depths = gt_depths
        self.logger = logger or MetricLogger(sink=_default_sink(cfg))

        if cfg.method == "dynamicdepth":
            from mal_tpu.dynamic.model import DynDepthModel
            self.model = DynDepthModel(cfg)
        elif cfg.method == "dualrefine":
            from mal_tpu.dualref.model import DEQDepthPose
            self.model = DEQDepthPose(cfg)
        else:
            self.model = MALModel(cfg)
        self.tx = make_optimizer(cfg)

        rng = jax.random.PRNGKey(seed)
        self.rng = rng
        sample = next(iter(train_loader))
        sample = jax.tree.map(jnp.asarray, sample)
        self.state = create_train_state(cfg, self.model, rng, sample)

        # frozen Mask2Former front-end — for the MAL temporal hint
        # (`manydepth/trainer.py:350-357`) and/or online doj-mask
        # generation (cfg.online_doj, `segment/doj.py`)
        seg_fn = None
        doj_fn = None
        online_doj = cfg.method == "dynamicdepth" and cfg.online_doj
        if cfg.temporal or cfg.main_temporal or online_doj:
            from mal_tpu.segment.mask2former import (
                Mask2Former, make_seg_fn, resolve_fused_swin)
            # fast-training mode (bf16 trunks) also runs the frozen Swin-L
            # matmuls in bf16: measured 1.17x on the seg forward with
            # boundary-pixel-only mask deviation (benchmarks/
            # bench_bf16_backbone.py); exact fp32 whenever compute_dtype is
            self.seg_model = Mask2Former(
                max_instances=cfg.max_instances,
                bf16_backbone=cfg.compute_dtype == "bfloat16",
                fused_swin=resolve_fused_swin(cfg))
            if seg_variables is None:
                # The reference always builds the segmenter from pretrained
                # COCO weights (`manydepth/options.py:288-295`); an untrained
                # Mask2Former synthesizes garbage hints, so refuse rather
                # than silently degrade. Convert a checkpoint with
                # `mal_tpu.convert.mask2former` and pass `seg_variables`.
                raise ValueError(
                    "cfg.temporal/main_temporal/online_doj requires "
                    "pretrained Mask2Former weights: pass seg_variables (see "
                    "mal_tpu.convert.mask2former.convert_mask2former_pkl); "
                    "random-init segmentation would make the temporal hint "
                    "synthesize noise")
            # weights flow through the step as an ARGUMENT (closure would
            # embed the Swin-L pytree as program constants)
            if cfg.temporal or cfg.main_temporal:
                seg_fn = make_seg_fn(self.seg_model, None, cfg.max_instances,
                                     mask_threshold=0.0)
            if online_doj:
                from mal_tpu.segment.doj import make_doj_fn
                doj_fn = make_doj_fn(self.seg_model, cfg.max_instances,
                                     score_threshold=cfg.ins_threshold)
            self.seg_variables = seg_variables

        # multi-host: one process per host (jax.distributed.initialize done
        # by the caller); the global mesh spans every chip and each host's
        # loader feeds its own shard (SURVEY.md §2.6)
        from mal_tpu.parallel import is_multihost
        self._multihost = is_multihost()
        if self._multihost:
            from mal_tpu.parallel import make_global_mesh
            assert num_devices is None, \
                "num_devices is per-host only; multi-host uses all devices"
            self.mesh = make_global_mesh()
        elif cfg.num_depth_shards > 1:
            from mal_tpu.parallel.mesh import make_mesh_2d
            # num_data_shards=0: every remaining device goes to the data axis
            n_data = cfg.num_data_shards or (
                (num_devices or len(jax.devices()))
                // cfg.num_depth_shards)
            self.mesh = make_mesh_2d(n_data, cfg.num_depth_shards)
        elif cfg.num_data_shards > 1:
            self.mesh = make_mesh(cfg.num_data_shards)
        else:
            self.mesh = make_mesh(num_devices)
        if cfg.method == "dynamicdepth":
            from mal_tpu.dynamic.step import make_dynamic_train_step
            raw_step = make_dynamic_train_step(cfg, self.model, self.tx,
                                               doj_fn=doj_fn)
        elif cfg.method == "dualrefine":
            from mal_tpu.dualref.step import make_dualref_train_step
            raw_step = make_dualref_train_step(cfg, self.model, self.tx)
        else:
            raw_step = make_train_step(cfg, self.model, self.tx, seg_fn=seg_fn)
        self._temporal = seg_fn is not None or doj_fn is not None
        self.step_fn = data_parallel_step(
            raw_step, self.mesh, n_extra_repl=1 if self._temporal else 0)
        self.state = replicate(self.state, self.mesh)
        if self._temporal:
            self._seg_vars_repl = replicate(self.seg_variables, self.mesh)
        self.step = 0
        self.start_time = time.time()

    def load_pretrained(self, folder: str,
                        models_to_load: tuple[str, ...] | None = None,
                        bins: bool = True):
        """Initialize sub-networks from a reference-layout `.pth` checkpoint
        directory before training.

        The `--load_pretrained` / `--load_weights_folder` /
        `--mono_weights_folder` family: the reference's headline MAL recipe
        fine-tunes FROM a pretrained ManyDepth dir (`repdepth.py:76-99`
        `load_manydepth`, restoring depth bins from `encoder.pth`);
        `--mono_weights_folder` loads only the teacher+pose nets with a
        filtered state-dict update (`manydepth/trainer.py:1638-1655`), which
        is `models_to_load=("mono_encoder", "mono_depth", "pose_encoder",
        "pose")` here; `--models_to_load` is the same filter for the student
        nets (`dynamicdepth/trainer.py:1403`). Optimizer moments start fresh,
        as in the reference's `load_manydepth` path.
        """
        cfg = self.cfg
        if cfg.method == "dualrefine":
            from mal_tpu.convert import convert_dualrefine_checkpoint_dir
            params, stats, extras = convert_dualrefine_checkpoint_dir(folder)
        elif cfg.method == "dynamicdepth":
            from mal_tpu.dynamic.evaluate import convert_dynamic_checkpoint_dir
            params, stats, extras = convert_dynamic_checkpoint_dir(
                folder, only=models_to_load)
        else:
            from mal_tpu.convert import convert_mal_checkpoint_dir
            params, stats, extras = convert_mal_checkpoint_dir(
                folder, pose_cnn=cfg.pose_cnn, only=models_to_load)
        # the dynamic converter hoists reduce_conv out of "encoder"; an
        # "encoder" subset must carry it along (it IS part of the
        # reference's encoder net)
        if (models_to_load is not None and cfg.method == "dynamicdepth"
                and "encoder" in models_to_load):
            models_to_load = tuple(models_to_load) + ("reduce_conv",)

        host = jax.device_get(self.state)
        new_params = dict(host.params)
        new_stats = dict(host.batch_stats)
        loaded = []
        for name, sub in params.items():
            if models_to_load is not None and name not in models_to_load:
                continue
            if name not in new_params:
                raise KeyError(f"checkpoint net {name!r} not in the model "
                               f"(have {sorted(new_params)})")
            new_params[name] = jax.tree.map(jnp.asarray, sub)
            if name in stats:
                new_stats[name] = jax.tree.map(jnp.asarray, stats[name])
            loaded.append(name)
        host = host.replace(params=new_params, batch_stats=new_stats)

        if bins and "min_depth_bin" in extras:
            host = host.replace(bins=host.bins.load(
                extras["min_depth_bin"], extras["max_depth_bin"],
                extras.get("mean_depth_bin"), extras.get("median_depth_bin")))
        self.state = replicate(host, self.mesh)
        print(f"loaded pretrained nets {loaded} from {folder}", flush=True)
        return loaded

    def load_imagenet(self, path: str):
        """`--weights_init pretrained`: initialize the ResNet trunks from a
        torchvision ImageNet checkpoint (`.pth` state dict).

        The reference builds every ResNet encoder with
        `torchvision.models.resnet18(pretrained=True)`
        (`manydepth/networks/resnet_encoder.py:377`; default
        `--weights_init pretrained`, `options.py:142-145`); the 2-image pose
        encoder tiles conv1 and divides by the image count
        (`resnet_encoder.py:63-67`). No network egress exists here, so the
        checkpoint file is user-supplied (torchvision's standard
        `resnet18-*.pth`). Decoders/heads keep their fresh init, exactly as
        in the reference.
        """
        if self.cfg.method == "dualrefine":
            raise NotImplementedError(
                "dualrefine uses HRNet encoders; ImageNet-init them by "
                "converting an HRNet release checkpoint (see "
                "mal_tpu.convert.dualref) — the torchvision resnet layout "
                "does not apply")
        if self.cfg.num_layers != 18:
            raise NotImplementedError(
                "single-file ImageNet init assumes resnet18 everywhere (the "
                f"reference's default); got num_layers={self.cfg.num_layers}")
        from mal_tpu.convert import convert_imagenet_trunk, load_pth

        sd = load_pth(path)
        host = jax.device_get(self.state)
        params, stats = dict(host.params), dict(host.batch_stats)

        def _replace_trunk(net: str, n_images: int):
            tp, ts = convert_imagenet_trunk(sd, 18, n_images)
            tp = jax.tree.map(jnp.asarray, tp)
            ts = jax.tree.map(jnp.asarray, ts)
            sub_p, sub_s = params[net], dict(stats.get(net, {}))
            if "encoder" in sub_p:  # wrapper module: trunk nested under it
                sub_p = dict(sub_p)
                assert (jax.tree.structure(sub_p["encoder"])
                        == jax.tree.structure(tp)), net
                sub_p["encoder"], sub_s["encoder"] = tp, ts
            else:                   # the net IS the trunk (ResNetFeatures)
                assert jax.tree.structure(sub_p) == jax.tree.structure(tp), net
                sub_p, sub_s = tp, ts
            params[net], stats[net] = sub_p, sub_s

        _replace_trunk("encoder", 1)
        _replace_trunk("mono_encoder", 1)
        if not self.cfg.pose_cnn:
            _replace_trunk("pose_encoder", 2)
        self.state = replicate(
            host.replace(params=params, batch_stats=stats), self.mesh)
        print(f"ImageNet trunk init from {path}", flush=True)

    def resume(self, ckpt_path: str):
        """Restore a saved TrainState and continue mid-run (the reference has
        no mid-epoch resume at all; SURVEY.md §5 checkpoint/resume).

        Accepts either a `step_NNNNNNNN` path or its parent save dir (the
        latest step is taken, like `cli eval --ckpt`)."""
        from mal_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

        if not os.path.basename(ckpt_path.rstrip("/")).startswith("step_"):
            latest = latest_checkpoint(ckpt_path)
            if latest is None:
                raise FileNotFoundError(
                    f"no step_* checkpoint under {ckpt_path}")
            ckpt_path = latest
        restored = load_checkpoint(ckpt_path, jax.device_get(self.state))
        self.state = replicate(restored, self.mesh)
        self.step = int(restored.step)
        return self.step

    # ------------------------------------------------------------------
    def train(self, start_epoch: int = 0):
        """`start_epoch` > 0 resumes mid-run: epoch-keyed schedules (loss_blc
        lambda annealing, the DualRefine freeze epoch, save_frequency) see
        the true epoch index instead of replaying from 0."""
        for epoch in range(start_epoch, self.cfg.num_epochs):
            self.run_epoch(epoch)
        return self.state

    def run_epoch(self, epoch: int):
        cfg = self.cfg
        # DualRefine freeze schedule (`dualrefine/trainer.py:207-213`): from
        # freeze_teacher_epoch only the refinement student trains. Like the
        # reference's dynamicdepth freeze (`dynamicdepth/trainer.py:287-305`)
        # the optimizer is rebuilt, so Adam moments restart at the boundary.
        if (cfg.method == "dualrefine"
                and epoch == cfg.freeze_teacher_epoch and epoch > 0):
            from mal_tpu.dualref.step import make_dualref_train_step
            self.tx = make_optimizer(cfg, freeze_backbone=True)
            params = jax.device_get(self.state).params
            self.state = self.state.replace(opt_state=self.tx.init(params))
            self.step_fn = data_parallel_step(
                make_dualref_train_step(cfg, self.model, self.tx), self.mesh)
            self.state = replicate(jax.device_get(self.state), self.mesh)

        # loss-balancer cumulative window resets per epoch
        # (`loss_utils.py:294,321`)
        self.state = self.state.replace(
            balancer=self.state.balancer.reset_epoch())
        epoch_arr = replicate(jnp.asarray(epoch, jnp.float32), self.mesh)

        it = self.train_loader.epoch(epoch) if hasattr(self.train_loader, "epoch") \
            else iter(self.train_loader)
        for batch in it:
            self.rng, step_rng = jax.random.split(self.rng)
            if self._multihost:
                from mal_tpu.parallel import shard_host_batch
                batch = shard_host_batch(batch, self.mesh)
            else:
                batch = shard_batch(jax.tree.map(jnp.asarray, batch), self.mesh)
            extras = (self._seg_vars_repl,) if self._temporal else ()
            self.state, metrics = self.step_fn(
                self.state, batch, replicate(step_rng, self.mesh), epoch_arr,
                *extras)

            if self.step % cfg.log_every == 0:
                m = jax.device_get(metrics)
                m["lr_step"] = self.step
                m["elapsed"] = time.time() - self.start_time
                self.logger.log(m, self.step)

            early = self.step == 250
            # periodic validation gated by --validate_from
            # (`manydepth/trainer.py:514`)
            periodic = (self.step != 0 and self.step % cfg.validate_every == 0
                        and self.step > cfg.validate_from)
            if (early or periodic) and self.val_batches is not None:
                results = self.validate()
                self.logger.log({f"val/{k}": v for k, v in results.items()},
                                self.step)
                # --save_until: checkpoints only from that step on
                # (`manydepth/trainer.py:536`)
                if periodic and cfg.ckpt_dir and self.step >= cfg.save_until:
                    save_checkpoint(os.path.join(
                        cfg.ckpt_dir, f"{cfg.model_name}_s{self.step}"),
                        self.state, cfg)
            self.step += 1

        # --save_frequency end-of-epoch save — DualRefine's cadence
        # (`dualrefine/trainer.py:219`; the other stacks save at validation)
        if (cfg.method == "dualrefine" and cfg.ckpt_dir
                and cfg.save_frequency > 0
                and (epoch + 1) % cfg.save_frequency == 0):
            save_checkpoint(os.path.join(
                cfg.ckpt_dir, f"{cfg.model_name}_e{epoch}"), self.state, cfg)

        print(f"epoch {epoch} done at step {self.step} "
              f"({sec_to_hm_str(time.time() - self.start_time)})", flush=True)

    # ------------------------------------------------------------------
    def validate(self) -> dict:
        """Full eval-split validation (`manydepth/trainer.py:836-1064`)."""
        state = jax.device_get(self.state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if self.cfg.method == "dualrefine":
            from mal_tpu.dualref.evaluate import infer_disparities_dualref
            disps = infer_disparities_dualref(
                self.model, variables, self.val_batches, self.cfg)
        elif self.cfg.method == "dynamicdepth":
            # full eval_mode protocol incl. doj metric families
            from mal_tpu.dynamic.evaluate import evaluate_dynamic
            if self.gt_depths is None:
                return {"n_images": float(len(self.val_batches))}
            return evaluate_dynamic(
                self.cfg, variables, self.val_batches, self.gt_depths,
                min_depth_bin=float(state.bins.min_depth),
                max_depth_bin=float(state.bins.max_depth))
        else:
            disps = infer_disparities(
                self.model, variables, self.val_batches, self.cfg,
                min_depth_bin=state.bins.min_depth,
                max_depth_bin=state.bins.max_depth)
        if self.cfg.log_disp_images > 0 and self.cfg.ckpt_dir:
            from mal_tpu.utils.vis import dump_disp_images
            dump_disp_images(disps, os.path.join(self.cfg.ckpt_dir, "images"),
                             self.step, n=self.cfg.log_disp_images)
        if self.gt_depths is None:
            return {"n_images": float(len(disps))}
        return evaluate_depth_maps(disps, self.gt_depths,
                                   eval_split=self.cfg.eval_split)
