"""Command-line entry points.

`python -m mal_tpu.cli train --preset kitti --data_path ...`
`python -m mal_tpu.cli eval --ckpt ... --gt splits/eigen/gt_depths.npz`

Replaces the reference's `python -m manydepth.train` / `evaluate_depth`
argparse stacks; any Config field can be overridden with `--set key=value`.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

import numpy as np

from mal_tpu.config import PRESETS, Config


def _apply_overrides(cfg: Config, pairs: list[str]) -> Config:
    updates = {}
    for pair in pairs:
        key, value = pair.split("=", 1)
        try:
            updates[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            updates[key] = value
    return cfg.replace(**updates)


def _build_loaders(cfg: Config, shard=None):
    from mal_tpu.data.cityscapes import CityscapesPreprocessedDataset
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.utils.misc import readlines

    datasets = {"kitti": KITTIRAWDataset,
                "cityscapes_preprocessed": CityscapesPreprocessedDataset}
    ds_cls = datasets[cfg.dataset]
    split_dir = os.path.join("splits", cfg.split)
    train_files = readlines(os.path.join(split_dir, "train_files.txt"))
    ds = ds_cls(cfg.data_path, train_files, cfg.height, cfg.width,
                cfg.frames_to_load, is_train=True,
                img_ext=".png" if cfg.png else ".jpg",
                seg_cache_root=cfg.seg_cache_root)
    shard = shard if shard is not None else (0, 1)

    # production path: threaded native decode + background prefetch
    # (`manydepth/trainer.py:270-316` num_workers equivalent); fall back to
    # the single-threaded PIL loader when the native lib or path-addressable
    # dataset API is unavailable
    if cfg.native_loader:
        from mal_tpu.data import native
        from mal_tpu.data.fast_loader import NativePrefetchLoader

        if native.available() and hasattr(ds, "get_image_path"):
            return NativePrefetchLoader(
                ds, cfg.batch_size, shuffle=True, drop_last=True,
                shard=shard, num_threads=max(cfg.num_workers, 1))
    return DataLoader(ds, cfg.batch_size, shuffle=True, drop_last=True,
                      shard=shard)


def cmd_train(args):
    from mal_tpu.config import TRAIN_FAST_SETTINGS

    cfg = PRESETS[args.preset].replace(data_path=args.data_path)
    # bf16 fast-training defaults (overridable with --set compute_dtype=...)
    cfg = cfg.replace(**TRAIN_FAST_SETTINGS)
    cfg = _apply_overrides(cfg, args.set or [])

    shard = None
    if args.coordinator:
        # multi-host DCN: run this command once per host
        # (the `accelerate launch --multi_gpu` equivalent, SURVEY.md §2.6)
        from mal_tpu.parallel import initialize_distributed
        initialize_distributed(args.coordinator, args.num_hosts, args.host_id)
        shard = (args.host_id, args.num_hosts)

    from mal_tpu.train.trainer import Trainer

    seg_variables = None
    if args.seg_pkl:
        # frozen Mask2Former weights for the temporal hint / online doj
        # masks (the reference's --ins_weight_path COCO checkpoint,
        # `manydepth/options.py:288-295`)
        from mal_tpu.convert.mask2former import convert_mask2former_pkl
        seg_variables = convert_mask2former_pkl(args.seg_pkl)

    # validation loader from the eval split (the reference always builds one
    # from the split's test_files.txt, `manydepth/trainer.py:283,299-316`;
    # checkpoints are ONLY written at validation, `:514-537`). --gt enables
    # full depth metrics; without it validation still runs (and still
    # triggers the checkpoint save) but only reports image counts.
    val_batches = None
    gt_depths = None
    if not args.no_eval:
        val_files = os.path.join("splits", cfg.eval_split, "test_files.txt")
        if os.path.isfile(val_files):
            frames = (0, -1, 1) if cfg.method == "dynamicdepth" else (0, -1)
            val_batches = _build_eval_loader(
                cfg, args.eval_data_path or args.data_path, frames=frames,
                batch_size=1 if cfg.method == "dynamicdepth"
                else cfg.batch_size)
            if args.gt:
                gt_depths = _load_gt_depths(args.gt)

    loader = _build_loaders(cfg, shard=shard)
    trainer = Trainer(cfg, loader, seg_variables=seg_variables,
                      val_batches=val_batches, gt_depths=gt_depths)
    if args.imagenet_ckpt:
        # --weights_init pretrained: torchvision ImageNet trunk init
        # (`manydepth/options.py:142-145`, `resnet_encoder.py:377`).
        # Applied first — checkpoint loads below overwrite it, matching the
        # reference's construct-then-load order.
        trainer.load_imagenet(args.imagenet_ckpt)
    if args.load_pretrained:
        # the reference's headline recipe: fine-tune from a pretrained
        # ManyDepth dir (`README.md:22` --load_pretrained, repdepth.py:76-99)
        trainer.load_pretrained(
            args.load_pretrained,
            models_to_load=(tuple(args.models_to_load)
                            if args.models_to_load else None))
    if args.mono_ckpt:
        # --mono_weights_folder: teacher + pose nets only
        # (`manydepth/trainer.py:1638-1655`)
        trainer.load_pretrained(
            args.mono_ckpt, bins=False,
            models_to_load=("mono_encoder", "mono_depth",
                            "pose_encoder", "pose"))
    start_epoch = 0
    if args.resume:
        resumed_step = trainer.resume(args.resume)
        try:
            steps_per_epoch = len(loader)
        except TypeError:
            steps_per_epoch = cfg.steps_per_epoch
        if steps_per_epoch:
            # continue from the interrupted epoch so epoch-keyed schedules
            # (loss_blc annealing, freeze epochs, save_frequency) line up
            start_epoch = resumed_step // steps_per_epoch
    trainer.train(start_epoch=start_epoch)


def _load_gt_depths(path: str):
    """GT depths for eval/validation: a KITTI-style `gt_depths.npz` or a
    directory of `NNN_depth.npy` files (the Cityscapes layout the reference
    reads per-image, `dynamicdepth/trainer.py:1177`)."""
    if os.path.isdir(path):
        files = sorted(f for f in os.listdir(path)
                       if f.endswith("_depth.npy"))
        return [np.load(os.path.join(path, f)) for f in files]
    return np.load(path, fix_imports=True, encoding="latin1",
                   allow_pickle=True)["data"]


def _build_eval_loader(cfg: Config, data_path: str, frames=(0, -1),
                       doj_root: str | None = None,
                       batch_size: int | None = None):
    from mal_tpu.data.cityscapes import CityscapesEvalDataset
    from mal_tpu.data.kitti import KITTIRAWDataset
    from mal_tpu.data.mono_dataset import DataLoader
    from mal_tpu.utils.misc import readlines

    files = readlines(os.path.join("splits", cfg.eval_split, "test_files.txt"))
    if cfg.eval_split == "cityscapes":
        ds = CityscapesEvalDataset(data_path, files, cfg.height, cfg.width,
                                   list(frames), is_train=False)
    else:
        ds = KITTIRAWDataset(data_path, files, cfg.height, cfg.width,
                             list(frames), is_train=False,
                             img_ext=".png" if cfg.png else ".jpg")
    if doj_root:
        from mal_tpu.data.doj import attach_doj_masks
        ds = attach_doj_masks(ds, doj_root)
    return DataLoader(ds, batch_size or cfg.batch_size, shuffle=False,
                      drop_last=False)


def cmd_export_pth(args):
    """Export a mal_tpu orbax checkpoint to the reference's `.pth` layout,
    so the reference's own tooling can ingest mal-trained weights:
    per-net files for ManyDepth (`repdepth.py:76-99`) and DynamicDepth
    (`dynamicdepth/trainer.py:1380-1407`), a single `depth_pose.pth` for
    DualRefine (`dualrefine/evaluate_depth.py:105-149`).
    """
    cfg, variables, bins = _load_orbax_state(args.ckpt, args.set or [])
    import jax

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    extras = {"min_depth_bin": bins[0], "max_depth_bin": bins[1]}
    if cfg.method == "dualrefine":
        from mal_tpu.convert.export_dualref import \
            export_dualrefine_checkpoint_dir
        # the reference checkpoint format also carries mean/median trackers
        # (`dualrefine/trainer.py:903`); the bin tracker records their EMAs
        # during dualrefine training (train/state.py track_stats)
        extras.update(height=cfg.height, width=cfg.width,
                      mean_depth_bin=bins[2], median_depth_bin=bins[3])
        paths = [export_dualrefine_checkpoint_dir(params, stats, args.out,
                                                  extras)]
    elif cfg.method == "dynamicdepth":
        from mal_tpu.convert.export_pth import export_dynamic_checkpoint_dir
        paths = export_dynamic_checkpoint_dir(params, stats, args.out,
                                              extras=extras,
                                              num_layers=cfg.num_layers)
    else:
        from mal_tpu.convert.export_pth import export_mal_checkpoint_dir
        paths = export_mal_checkpoint_dir(params, stats, args.out,
                                          extras=extras,
                                          num_layers=cfg.num_layers)
    print("\n".join(paths))


def _load_orbax_state(ckpt: str, overrides: list[str]):
    """Restore a mal_tpu orbax TrainState checkpoint for inference.

    `ckpt` is either a `step_NNNNNNNN` path or its parent directory (the
    latest step is taken). The training `config.json` sidecar supplies the
    model hyperparameters; `--set` overrides still apply (e.g. eval_split).
    Returns (cfg, variables, (min_bin, max_bin, mean_bin, median_bin)).
    """
    import jax
    import jax.numpy as jnp

    from mal_tpu.data.synthetic import synthetic_batch
    from mal_tpu.train.state import create_train_state
    from mal_tpu.utils.checkpoint import (latest_checkpoint, load_checkpoint,
                                          load_config)

    if os.path.basename(ckpt.rstrip("/")).startswith("step_"):
        step_path, cfg_dir = ckpt, os.path.dirname(ckpt.rstrip("/"))
    else:
        step_path, cfg_dir = latest_checkpoint(ckpt), ckpt
        if step_path is None:
            raise SystemExit(f"no step_* checkpoint under {ckpt}")
    cfg = _apply_overrides(load_config(cfg_dir), overrides)

    if cfg.method == "dynamicdepth":
        from mal_tpu.dynamic.model import DynDepthModel
        model = DynDepthModel(cfg)
    elif cfg.method == "dualrefine":
        from mal_tpu.dualref.model import DEQDepthPose
        model = DEQDepthPose(cfg)
    else:
        from mal_tpu.models import MALModel
        model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    template = create_train_state(
        cfg, model, rng, jax.device_get(synthetic_batch(cfg, rng,
                                                        batch_size=2)))
    state = load_checkpoint(step_path, template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, variables, (float(jnp.asarray(state.bins.min_depth)),
                            float(jnp.asarray(state.bins.max_depth)),
                            float(jnp.asarray(state.bins.mean_depth)),
                            float(jnp.asarray(state.bins.median_depth)))


def cmd_eval(args):
    cfg = PRESETS[args.preset]
    cfg = _apply_overrides(cfg, args.set or [])

    from mal_tpu.eval.evaluate import evaluate_depth_maps, infer_disparities

    # stereo-trained models: fixed baseline scale, no median scaling
    # (`manydepth/evaluate_depth.py:32,245-247` semantics of --eval_stereo)
    scale_factor = args.pred_depth_scale_factor
    median_scaling = not args.disable_median_scaling
    if args.eval_stereo:
        from mal_tpu.eval.postprocess import STEREO_SCALE_FACTOR
        scale_factor = STEREO_SCALE_FACTOR
        median_scaling = False

    if args.ext_disp_to_eval:
        # evaluate saved predictions without running the model
        # (`dualrefine/evaluate_depth.py:193-200`)
        from mal_tpu.eval.postprocess import load_ext_disps
        disps = load_ext_disps(args.ext_disp_to_eval)
        _finish_eval(args, cfg, disps, median_scaling, scale_factor)
        return

    is_pth = args.ckpt.endswith(".pth") or (
        os.path.isdir(args.ckpt)
        and any(f.endswith(".pth") for f in os.listdir(args.ckpt)))
    if not is_pth:
        # mal_tpu's own orbax TrainState checkpoints
        cfg, variables, bins = _load_orbax_state(args.ckpt, args.set or [])
        if cfg.method == "dynamicdepth":
            from mal_tpu.dynamic.evaluate import evaluate_dynamic
            if not args.gt:
                raise SystemExit("dynamicdepth eval needs --gt (the eval_mode"
                                 " protocol computes doj metrics against GT)")
            loader = _build_eval_loader(cfg, args.data_path,
                                        frames=(0, -1, 1),
                                        doj_root=args.doj_root, batch_size=1)
            import numpy as np

            # same GT formats as the .pth path (run_dynamic_eval)
            gt = _load_gt_depths(args.gt)
            results = evaluate_dynamic(cfg, variables, iter(loader), gt,
                                       min_depth_bin=bins[0],
                                       max_depth_bin=bins[1])
            print(json.dumps(results, indent=2))
            return
        loader = _build_eval_loader(cfg, args.data_path)
        if cfg.method == "dualrefine":
            from mal_tpu.dualref.evaluate import infer_disparities_dualref
            from mal_tpu.dualref.model import DEQDepthPose
            model = DEQDepthPose(cfg)
            disps = infer_disparities_dualref(model, variables, iter(loader),
                                              cfg)
        else:
            from mal_tpu.models import MALModel
            model = MALModel(cfg)
            disps = infer_disparities(
                model, variables, iter(loader), cfg,
                eval_teacher=args.eval_teacher,
                min_depth_bin=bins[0], max_depth_bin=bins[1],
                zero_cost_volume=args.zero_cost_volume,
                static_camera=args.static_camera,
                post_process=args.post_process)
        _finish_eval(args, cfg, disps, median_scaling, scale_factor)
        return

    loader = _build_eval_loader(cfg, args.data_path)

    if cfg.method == "dualrefine":
        from mal_tpu.convert import convert_dualrefine_checkpoint_dir
        from mal_tpu.dualref.evaluate import infer_disparities_dualref
        from mal_tpu.dualref.model import DEQDepthPose

        folder = args.ckpt if os.path.isdir(args.ckpt) else \
            os.path.dirname(args.ckpt)
        params, stats, extras = convert_dualrefine_checkpoint_dir(folder)
        if "height" in extras:
            cfg = cfg.replace(height=int(extras["height"]),
                              width=int(extras["width"]))
            loader = _build_eval_loader(cfg, args.data_path)
        model = DEQDepthPose(cfg)
        variables = {"params": params, "batch_stats": stats}
        disps = infer_disparities_dualref(model, variables, iter(loader), cfg)
    elif cfg.method == "dynamicdepth":
        # the reference's eval_mode accumulates GT/doj per batch index with
        # batch size 1 (`dynamicdepth/trainer.py:1177,1228-1230`)
        from mal_tpu.dynamic.evaluate import run_dynamic_eval
        loader = _build_eval_loader(cfg, args.data_path, frames=(0, -1, 1),
                                    doj_root=args.doj_root, batch_size=1)
        results = run_dynamic_eval(cfg, args.ckpt, loader, args.gt)
        print(json.dumps(results, indent=2))
        return
    else:
        from mal_tpu.convert import convert_mal_checkpoint_dir
        from mal_tpu.models import MALModel

        params, stats, extras = convert_mal_checkpoint_dir(args.ckpt)
        variables = {"params": params, "batch_stats": stats}
        min_bin = float(extras.get("min_depth_bin", 0.1))
        max_bin = float(extras.get("max_depth_bin", 10.0))
        model = MALModel(cfg)
        disps = infer_disparities(model, variables, iter(loader), cfg,
                                  eval_teacher=args.eval_teacher,
                                  min_depth_bin=min_bin, max_depth_bin=max_bin,
                                  zero_cost_volume=args.zero_cost_volume,
                                  static_camera=args.static_camera,
                                  post_process=args.post_process)

    median_scaling = not args.disable_median_scaling
    scale_factor = args.pred_depth_scale_factor
    if args.eval_stereo:
        from mal_tpu.eval.postprocess import STEREO_SCALE_FACTOR
        scale_factor = STEREO_SCALE_FACTOR
        median_scaling = False
    _finish_eval(args, cfg, disps, median_scaling, scale_factor)


def _finish_eval(args, cfg, disps, median_scaling, scale_factor):
    from mal_tpu.eval.evaluate import evaluate_depth_maps

    if args.save_pred_disps:
        from mal_tpu.eval.postprocess import save_pred_disps
        folder = "."
        if args.ckpt:
            folder = args.ckpt if os.path.isdir(args.ckpt) else \
                os.path.dirname(args.ckpt) or "."
        path = save_pred_disps(
            disps, folder, cfg.eval_split,
            eval_teacher=getattr(args, "eval_teacher", False),
            zero_cost_volume=getattr(args, "zero_cost_volume", False))
        print(f"saved predicted disparities: {path}")
    if args.no_eval:
        print("evaluation disabled (--no_eval)")
        return
    if cfg.eval_split == "benchmark":
        # KITTI benchmark submission export, no local GT
        # (`dualrefine/evaluate_depth.py:218-233`)
        from mal_tpu.eval.postprocess import export_benchmark_predictions
        out_dir = os.path.join(os.path.dirname(args.gt) if args.gt else ".",
                               "benchmark_predictions")
        n = export_benchmark_predictions(np.asarray(disps), out_dir)
        print(f"exported {n} benchmark predictions to {out_dir}")
        return

    if not args.gt:
        raise SystemExit("--gt is required unless --no_eval or "
                         "eval_split=benchmark")
    gt = np.load(args.gt, fix_imports=True, encoding="latin1",
                 allow_pickle=True)["data"]
    results = evaluate_depth_maps(disps, gt, eval_split=cfg.eval_split,
                                  median_scaling=median_scaling,
                                  pred_depth_scale_factor=scale_factor)
    print(json.dumps(results, indent=2))


def cmd_finetune_seg(args):
    """Fine-tune the Mask2Former segmenter on a COCO-format dataset
    (the training path the reference runs through detectron2's
    `train_net.py`; here: `segment/{coco,criterion,finetune}.py`)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mal_tpu.segment.coco import CocoInstanceDataset
    from mal_tpu.segment.criterion import CriterionConfig
    from mal_tpu.segment.evaluation import evaluate_instances
    from mal_tpu.segment.finetune import make_seg_finetune_step
    from mal_tpu.segment.mask2former import Mask2Former, instance_inference

    ds = CocoInstanceDataset(args.annotations, args.images,
                             args.height, args.width,
                             max_instances=args.max_instances)
    model = Mask2Former(num_classes=ds.num_classes, swin_size=args.size,
                        num_queries=args.num_queries, bgr_input=False)
    rng = jax.random.PRNGKey(args.seed)
    if args.seg_pkl:
        from mal_tpu.convert.mask2former import convert_mask2former_pkl
        variables = convert_mask2former_pkl(args.seg_pkl, size=args.size)
    else:
        variables = model.init(
            rng, jnp.zeros((1, args.height, args.width, 3)))
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(variables)
    ccfg = CriterionConfig(num_classes=ds.num_classes,
                           num_points=args.num_points)
    step = jax.jit(make_seg_finetune_step(model, tx, ccfg))

    i = 0
    for epoch in range(args.epochs):
        for images, labels, masks, valid in ds.batches(
                args.batch_size, seed=args.seed + epoch):
            variables, opt_state, m = step(
                variables, opt_state, images, labels, masks, valid,
                jax.random.fold_in(rng, i))
            i += 1
            print(f"epoch {epoch} step {i}: "
                  + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()))

    # mask AP on the training set (no val split in the minimal CLI)
    preds, gts = [], []
    infer = jax.jit(lambda v, im: model.apply(v, im))
    for images, labels, masks, valid in ds.batches(args.batch_size,
                                                   shuffle=False):
        logits, pmasks = infer(variables, images)
        inst = instance_inference(logits, pmasks, args.height, args.width,
                                  max_instances=args.max_instances)
        for b in range(images.shape[0]):
            preds.append({"masks": np.asarray(inst.masks[b]),
                          "scores": np.asarray(inst.scores[b]),
                          "classes": np.asarray(inst.classes[b])})
            nb = np.asarray(valid[b]).sum()
            gts.append({"masks": np.asarray(masks[b])[:nb],
                        "classes": np.asarray(labels[b])[:nb]})
    ap = evaluate_instances(preds, gts)
    print(json.dumps({"AP": ap}, indent=2))

    if args.out:
        from flax import serialization
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "seg_variables.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(variables)))
        # detectron2-format .pkl alongside, so the fine-tuned segmenter
        # round-trips into the Mask2Former ecosystem (and back into
        # `--seg_pkl` / `convert_mask2former_pkl`)
        from mal_tpu.convert.mask2former import export_mask2former_pkl
        pkl = export_mask2former_pkl(jax.device_get(variables),
                                     os.path.join(args.out, "model.pkl"),
                                     size=args.size)
        print(f"saved: {path}\nsaved: {pkl}")


def cmd_export_seg(args):
    """Precompute the temporal hint's current-frame instances for a split
    (`segment/cache.py`): one frozen-segmenter forward per frame per
    orientation, written once, reused every epoch via
    `--set seg_cache_root=...` on train."""
    from mal_tpu.segment.cache import export_split_instances
    from mal_tpu.segment.mask2former import Mask2Former, make_seg_fn
    from mal_tpu.utils.misc import readlines

    cfg = PRESETS[args.preset].replace(data_path=args.data_path)
    cfg = _apply_overrides(cfg, args.set or [])

    from mal_tpu.data.cityscapes import CityscapesPreprocessedDataset
    from mal_tpu.data.kitti import KITTIRAWDataset

    datasets = {"kitti": KITTIRAWDataset,
                "cityscapes_preprocessed": CityscapesPreprocessedDataset}
    files = readlines(os.path.join("splits", cfg.split, "train_files.txt"))
    ds = datasets[cfg.dataset](cfg.data_path, files, cfg.height, cfg.width,
                               cfg.frames_to_load, is_train=True,
                               img_ext=".png" if cfg.png else ".jpg")

    from mal_tpu.convert.mask2former import convert_mask2former_pkl
    seg_variables = convert_mask2former_pkl(args.seg_pkl, size=args.size)
    model = Mask2Former(max_instances=cfg.max_instances,
                        swin_size=args.size,
                        bf16_backbone=cfg.compute_dtype == "bfloat16")
    import jax
    seg_fn = jax.jit(make_seg_fn(model, None, cfg.max_instances))

    n = export_split_instances(ds, seg_fn, seg_variables, args.out,
                               batch_size=cfg.batch_size)
    print(f"export-seg: wrote {n} frame-instance files to {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser("mal_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    pt.add_argument("--preset", default="kitti", choices=list(PRESETS))
    pt.add_argument("--data_path", required=True)
    pt.add_argument("--set", nargs="*", help="config overrides key=value")
    pt.add_argument("--seg_pkl", default=None,
                    help="detectron2 .pkl Mask2Former weights (required for "
                         "--set temporal=true/main_temporal=true/"
                         "online_doj=true)")
    pt.add_argument("--load_pretrained", default=None,
                    help="reference-layout .pth checkpoint dir to initialize "
                         "from (--load_pretrained/--load_weights_folder)")
    pt.add_argument("--imagenet_ckpt", default=None,
                    help="torchvision ImageNet resnet18 .pth for trunk init "
                         "(--weights_init pretrained)")
    pt.add_argument("--mono_ckpt", default=None,
                    help="checkpoint dir for teacher+pose nets only "
                         "(--mono_weights_folder)")
    pt.add_argument("--models_to_load", nargs="*", default=None,
                    help="subset of sub-nets to take from --load_pretrained")
    pt.add_argument("--resume", default=None,
                    help="orbax TrainState checkpoint to resume mid-run")
    pt.add_argument("--gt", default=None,
                    help="gt depths for validation metrics (gt_depths.npz "
                         "or a dir of NNN_depth.npy)")
    pt.add_argument("--eval_data_path", default=None,
                    help="data root for the validation split when it "
                         "differs from --data_path (the reference's "
                         "--cs_eval_path, `manydepth/trainer.py:296`)")
    pt.add_argument("--no_eval", action="store_true",
                    help="skip building the validation loader (NOTE: "
                         "periodic checkpoints are written at validation, "
                         "so only end-of-epoch dualrefine saves remain)")
    pt.add_argument("--coordinator", default=None,
                    help="host0:port for multi-host DCN training")
    pt.add_argument("--num_hosts", type=int, default=1)
    pt.add_argument("--host_id", type=int, default=0)
    pt.set_defaults(fn=cmd_train)

    pe = sub.add_parser("eval")
    pe.add_argument("--preset", default="kitti", choices=list(PRESETS))
    pe.add_argument("--data_path", required=True)
    pe.add_argument("--ckpt", default=None,
                    help="checkpoint (.pth dir); optional with "
                         "--ext_disp_to_eval")
    pe.add_argument("--gt", default=None,
                    help="gt_depths.npz (optional with --no_eval or "
                         "eval_split=benchmark)")
    pe.add_argument("--doj_root", default=None,
                    help="dynamic-object mask dir (method=dynamicdepth)")
    pe.add_argument("--eval_teacher", action="store_true",
                    help="evaluate the mono teacher instead of the student "
                         "(`manydepth/options.py` --eval_teacher)")
    pe.add_argument("--post_process", action="store_true",
                    help="Monodepth-v1 flip averaging (teacher only)")
    pe.add_argument("--zero_cost_volume", action="store_true",
                    help="behavioral probe: zero lookup poses")
    pe.add_argument("--static_camera", action="store_true",
                    help="behavioral probe: lookup frames = current frame")
    pe.add_argument("--save_pred_disps", action="store_true",
                    help="save the predicted disparity stack next to the "
                         "checkpoint")
    pe.add_argument("--ext_disp_to_eval", default=None,
                    help="evaluate a saved .npy disparity stack instead of "
                         "running inference")
    pe.add_argument("--no_eval", action="store_true",
                    help="skip metric computation (with --save_pred_disps)")
    pe.add_argument("--disable_median_scaling", action="store_true")
    pe.add_argument("--pred_depth_scale_factor", type=float, default=1.0)
    pe.add_argument("--eval_stereo", action="store_true",
                    help="stereo-trained model: scale 5.4, no median "
                         "scaling")
    pe.add_argument("--set", nargs="*")
    pe.set_defaults(fn=cmd_eval)

    pf = sub.add_parser("finetune-seg")
    pf.add_argument("--images", required=True, help="image directory")
    pf.add_argument("--annotations", required=True, help="COCO json")
    pf.add_argument("--out", default=None, help="checkpoint output dir")
    pf.add_argument("--seg_pkl", default=None,
                    help="initialize from detectron2 .pkl weights")
    pf.add_argument("--size", default="tiny",
                    choices=("tiny", "small", "base", "large"))
    pf.add_argument("--height", type=int, default=256)
    pf.add_argument("--width", type=int, default=448)
    pf.add_argument("--epochs", type=int, default=1)
    pf.add_argument("--batch_size", type=int, default=2)
    pf.add_argument("--lr", type=float, default=1e-4)
    pf.add_argument("--weight_decay", type=float, default=0.05)
    pf.add_argument("--num_queries", type=int, default=100)
    pf.add_argument("--max_instances", type=int, default=16)
    pf.add_argument("--num_points", type=int, default=112 * 112)
    pf.add_argument("--seed", type=int, default=0)
    pf.set_defaults(fn=cmd_finetune_seg)

    pp = sub.add_parser("export-pth")
    pp.add_argument("--ckpt", required=True,
                    help="orbax checkpoint (step_* path or its parent dir)")
    pp.add_argument("--out", required=True,
                    help="output dir for the reference-layout .pth files")
    pp.add_argument("--set", nargs="*")
    pp.set_defaults(fn=cmd_export_pth)

    px = sub.add_parser("export-seg")
    px.add_argument("--preset", default="kitti", choices=list(PRESETS))
    px.add_argument("--data_path", required=True)
    px.add_argument("--seg_pkl", required=True,
                    help="detectron2 .pkl Mask2Former weights (the same "
                         "checkpoint the temporal hint trains with)")
    px.add_argument("--out", required=True,
                    help="cache directory (pass as --set seg_cache_root=... "
                         "on train)")
    px.add_argument("--size", default="large",
                    choices=("tiny", "small", "base", "large"),
                    help="Swin size of the .pkl checkpoint")
    px.add_argument("--set", nargs="*", help="config overrides key=value")
    px.set_defaults(fn=cmd_export_seg)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
