"""Integration tests: temporal-hint training, eval protocol, trainer loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mal_tpu.config import Config
from mal_tpu.data.synthetic import synthetic_batch
from mal_tpu.eval.evaluate import evaluate_depth_maps, infer_disparities
from mal_tpu.models import MALModel
from mal_tpu.segment.instances import Instances
from mal_tpu.train.state import create_train_state, make_optimizer
from mal_tpu.train.step import make_train_step

SMALL = Config(height=64, width=96, num_depth_bins=16, batch_size=2)


def dummy_seg_fn(seg_variables, images):
    """Deterministic fake segmenter: one box instance per image."""
    B, H, W, _ = images.shape
    inst = Instances.empty(B, 4, H, W)
    masks = inst.masks.at[:, 0, H // 4:H // 2, W // 4:W // 2].set(1.0)
    return Instances(
        masks=masks,
        classes=inst.classes.at[:, 0].set(2),
        scores=inst.scores.at[:, 0].set(0.9),
        valid=inst.valid.at[:, 0].set(True),
    )


@pytest.mark.slow
def test_temporal_train_step_runs():
    cfg = SMALL.replace(temporal=True, main_temporal=True)
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    state = create_train_state(cfg, model, rng, batch)
    tx = make_optimizer(cfg)
    step = jax.jit(make_train_step(cfg, model, tx, seg_fn=dummy_seg_fn))
    state1, metrics = step(state, batch, jax.random.PRNGKey(1), jnp.zeros(()))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1


def test_temporal_requires_seg_fn():
    cfg = SMALL.replace(temporal=True)
    model = MALModel(cfg)
    tx = make_optimizer(cfg)
    with pytest.raises(ValueError):
        make_train_step(cfg, model, tx, seg_fn=None)


def test_eval_protocol_perfect_prediction():
    """A disp that matches GT depth exactly -> all-zero errors after scaling."""
    rng = np.random.RandomState(0)
    gt_list, disp_list = [], []
    for _ in range(3):
        gt = rng.uniform(2, 60, (60, 200)).astype(np.float64)
        # pred_disp at a different resolution + arbitrary global scale;
        # nearest-resize the GT so bilinear disp-resize stays consistent
        gt_small = gt  # same res: avoids interpolation error entirely
        disp = (1.0 / gt_small) * 3.7  # scale removed by median scaling
        gt_list.append(gt)
        disp_list.append(disp.astype(np.float32))
    res = evaluate_depth_maps(disp_list, gt_list, eval_split="eigen")
    assert res["abs_rel"] < 1e-6
    assert res["a1"] == 1.0
    # pred_depth = gt / 3.7, so the median-scaling ratio is 3.7
    np.testing.assert_allclose(res["med_ratio"], 3.7, rtol=1e-5)


def test_eval_protocol_eigen_crop_masks_outside():
    """Errors outside the Garg crop must not affect the metrics."""
    gt = np.full((60, 200), 10.0)
    disp_good = np.full((60, 200), 0.1, np.float32)
    res_clean = evaluate_depth_maps([disp_good], [gt], "eigen")

    disp_bad = disp_good.copy()
    disp_bad[:20] = 0.9   # above the crop -> ignored
    res_bad = evaluate_depth_maps([disp_bad], [gt], "eigen")
    np.testing.assert_allclose(res_bad["abs_rel"], res_clean["abs_rel"],
                               atol=1e-7)


@pytest.mark.slow
def test_infer_disparities_shapes():
    cfg = SMALL
    model = MALModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, rng, batch_size=2)
    variables = model.init({"params": rng}, batch, jnp.asarray(0.1),
                           jnp.asarray(10.0), rng, train=False)
    variables = {k: v for k, v in variables.items()}
    disps = infer_disparities(model, variables, [batch, batch], cfg)
    assert disps.shape == (4, cfg.height, cfg.width)
    assert np.isfinite(disps).all()


@pytest.mark.slow
def test_trainer_loop_smoke():
    """3 steps of the host Trainer on a synthetic loader."""
    from mal_tpu.train.trainer import MetricLogger, Trainer

    cfg = SMALL.replace(log_every=1, validate_every=10**9, ckpt_dir="")

    class Loader:
        def __init__(self):
            self.batches = [
                jax.device_get(synthetic_batch(cfg, jax.random.PRNGKey(i), 2))
                for i in range(3)]

        def __iter__(self):
            return iter(self.batches)

        def epoch(self, e):
            return iter(self.batches)

    logs = []
    trainer = Trainer(cfg, Loader(), num_devices=1,
                      logger=MetricLogger(sink=lambda m, s: logs.append((s, m))))
    trainer.run_epoch(0)
    assert trainer.step == 3
    assert len(logs) == 3
    assert np.isfinite(logs[-1][1]["loss"])


@pytest.mark.slow
def test_trainer_resume_roundtrip(tmp_path):
    """Mid-run checkpoint -> fresh Trainer -> resume restores step + params
    (the reference has no mid-epoch resume at all; SURVEY.md §5)."""
    from mal_tpu.train.trainer import MetricLogger, Trainer
    from mal_tpu.utils.checkpoint import save_checkpoint

    cfg = SMALL.replace(log_every=10**9, validate_every=10**9, ckpt_dir="")

    class Loader:
        def __init__(self):
            self.batches = [
                jax.device_get(synthetic_batch(cfg, jax.random.PRNGKey(i), 2))
                for i in range(2)]

        def __iter__(self):
            return iter(self.batches)

        def epoch(self, e):
            return iter(self.batches)

    t1 = Trainer(cfg, Loader(), num_devices=1, logger=MetricLogger(
        sink=lambda m, s: None))
    t1.run_epoch(0)
    assert t1.step == 2
    path = save_checkpoint(str(tmp_path / "ck"), jax.device_get(t1.state), cfg)

    t2 = Trainer(cfg, Loader(), num_devices=1, logger=MetricLogger(
        sink=lambda m, s: None))
    resumed_step = t2.resume(path)
    assert resumed_step == 2
    p1 = jax.tree.leaves(jax.device_get(t1.state).params)[0]
    p2 = jax.tree.leaves(jax.device_get(t2.state).params)[0]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_dump_disp_images(tmp_path):
    """The disparity-image sink writes valid plasma PNGs at map size
    (reference's dormant TB image path, `manydepth/trainer.py:1533-1585`)."""
    from PIL import Image

    from mal_tpu.utils.vis import dump_disp_images

    rng = np.random.RandomState(0)
    disps = [rng.uniform(0, 1, (24, 32)).astype(np.float32)
             for _ in range(6)]
    paths = dump_disp_images(disps, str(tmp_path), step=7, n=3,
                             to_wandb=False)
    assert len(paths) == 3
    for p in paths:
        img = Image.open(p)
        assert img.size == (32, 24) and img.mode == "RGB"
