"""DynamicDepth gradient-level oracle vs the reference's OWN training code.

Companion to tests/test_ref_oracle_grads.py (ManyDepth): constructs the
reference DynamicDepth `Trainer` (`dynamicdepth/trainer.py:86-350`) on a
synthetic KITTI tree with doj masks, runs one `process_batch` +
`losses["loss"].backward()` (`trainer.py:435-660` — pose chaining, DOMD
forward-splat of the adjacent frames, occlusion-aware cost volume,
photometric/consistency/smoothness losses), and asserts the loss and every
per-parameter gradient match `jax.value_and_grad` of
`mal_tpu.dynamic.step.make_dynamic_loss_fn` on the identical weights and
batch tensors (taken from the reference's own train loader and snapshotted
before the trainer's in-place mutations, `trainer.py:501-506`).

Determinism pinning mirrors the ManyDepth oracle: `random.random` -> 0.9
(the matching augmentation never fires; mal side runs
no_matching_augmentation=True) and tie-break `randn` noise zeroed on both
sides. Reference defaults apply: NO distil (`compute_main_losses` is
commented out upstream, `trainer.py:30` — the --distil branch would
NameError), no loss_blc, no feat_loss.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims
from tests.ref_oracle.synth import (DRIVE, make_gt_depths, make_kitti_tree,
                                    write_split)

install_reference_shims()

H, W = 96, 320
BATCH = 2
N_IMAGES = 3
SEQ = DRIVE.split("/")[1]


@pytest.fixture(scope="module")
def ref_side(tmp_path_factory):
    root = tmp_path_factory.mktemp("dyn_grad_oracle")
    data, files = make_kitti_tree(root, N_IMAGES)
    write_split(root, "eigen", files, gts=make_gt_depths(N_IMAGES,
                                                         (144, 480)))
    write_split(root, "eigen_zhou", files)
    (root / "splits" / "eigen_zhou" / "withmask_files.txt").write_text(
        "\n".join(files) + "\n")

    # doj masks under the reference's TRAIN naming
    # (`dynamicdepth/datasets/kitti_dataset.py:106`:
    #  '{seq}_0{side_num}_{frame}') — redirected via basename below
    rng = np.random.RandomState(3)
    masks_dir = root / "train_masks"
    masks_dir.mkdir()
    for f in range(1, 1 + N_IMAGES):
        m = np.zeros((H, W), np.float32)
        m[40:60, 80 + 7 * f:150 + 7 * f] = 1.0
        np.save(masks_dir / f"{SEQ}_02_{f}.npy", m)
        np.save(masks_dir / f"{SEQ}_02_{f}-1.npy", np.roll(m, -4, axis=1))
        np.save(masks_dir / f"{SEQ}_02_{f}+1.npy", np.roll(m, 4, axis=1))

    from dynamicdepth.datasets import kitti_dataset as ref_kitti
    from dynamicdepth.options import MonodepthOptions
    from dynamicdepth import trainer as ref_trainer_mod

    log_dir = tmp_path_factory.mktemp("dyn_grad_log")
    opt = MonodepthOptions().parser.parse_args([
        "--data_path", data, "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--dataset", "kitti", "--split", "eigen_zhou",
        "--eval_split", "eigen", "--batch_size", str(BATCH),
        "--num_workers", "0", "--log_dir", str(log_dir), "--no_cuda",
    ])
    opt.load_weights_folder = None
    opt.mono_weights_folder = None

    orig_load = ref_kitti.KITTIRAWDataset.load_mask

    def load_mask(self, path):
        return orig_load(
            self, os.path.join(str(masks_dir), os.path.basename(path)))

    ref_kitti.KITTIRAWDataset.load_mask = load_mask
    cwd = os.getcwd()
    os.chdir(root)
    try:
        torch.manual_seed(5)
        trainer = ref_trainer_mod.Trainer(opt)
        for net in trainer.models.values():
            net.train()
        import random as pyrandom

        randn_orig, rand_orig = torch.randn, pyrandom.random
        torch.randn = lambda *a, **k: torch.zeros(*a, **k)
        # pinned BEFORE the loader fetch: the dataset's do_color_aug/do_flip
        # draws come from the unseeded global `random`, so the oracle batch
        # would otherwise depend on suite order (flake fixed 2026-08-18)
        pyrandom.random = lambda: 0.9
        try:
            inputs = next(iter(trainer.train_loader))
            # snapshot before process_batch's in-place frame blanking
            # (`trainer.py:501-506`)
            snap = {k: v.detach().clone() for k, v in inputs.items()
                    if torch.is_tensor(v)}
            sd0 = {name: {k: v.detach().clone()
                          for k, v in net.state_dict().items()}
                   for name, net in trainer.models.items()}
            min_bin = float(trainer.min_depth_tracker)
            max_bin = float(trainer.max_depth_tracker)

            outputs, losses = trainer.process_batch(inputs, 0, is_train=True)
            for net in trainer.models.values():
                net.zero_grad()
            losses["loss"].backward()
        finally:
            torch.randn, pyrandom.random = randn_orig, rand_orig

        ck = root / "ck_weights"
        gk = root / "ck_grads"
        ck.mkdir()
        gk.mkdir()
        for name, net in trainer.models.items():
            torch.save(sd0[name], ck / f"{name}.pth")
            named = dict(net.named_parameters())
            grads = {}
            for k, v in sd0[name].items():
                p = named.get(k)
                if p is not None and p.grad is not None:
                    grads[k] = p.grad.detach().clone()
                else:
                    grads[k] = (torch.zeros_like(v)
                                if v.dtype.is_floating_point else v)
            torch.save(grads, gk / f"{name}.pth")
    finally:
        os.chdir(cwd)
        ref_kitti.KITTIRAWDataset.load_mask = orig_load

    return {"ckpt": str(ck), "gradckpt": str(gk), "inputs": snap,
            "loss": float(losses["loss"].detach()),
            "min_bin": min_bin, "max_bin": max_bin}


def _nchw_to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def jax_side(ref_side):
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.dynamic.evaluate import convert_dynamic_checkpoint_dir
    from mal_tpu.dynamic.model import DynDepthModel
    from mal_tpu.dynamic.step import make_dynamic_loss_fn

    # reference dynamicdepth DEFAULTS, incl. the inverted store_false
    # flags: cv_min="true", cv_pool (store_false -> True, r=1, th=0.7),
    # selec_reproj + zero_img (store_false -> True), no distil
    # (--distil's compute_main_losses import is commented out upstream,
    # `dynamicdepth/trainer.py:30` — the branch would NameError)
    cfg = Config(method="dynamicdepth", height=H, width=W,
                 batch_size=BATCH, frame_ids=(0, -1, 1), distil=False,
                 loss_blc=False, use_ensemble=False,
                 no_matching_augmentation=True, use_pallas=False,
                 cv_min=True, cv_pool=True, cv_pool_radius=1,
                 cv_pool_th=0.7, selec_reproj=True, zero_img=True)
    params, stats, _ = convert_dynamic_checkpoint_dir(ref_side["ckpt"])
    gref, _, _ = convert_dynamic_checkpoint_dir(ref_side["gradckpt"])

    t = ref_side["inputs"]
    batch = {
        "color": {str(f): jnp.asarray(_nchw_to_nhwc(t[("color", f, 0)]))
                  for f in (0, -1, 1)},
        "color_aug": {
            str(f): jnp.asarray(_nchw_to_nhwc(t[("color_aug", f, 0)]))
            for f in (0, -1, 1)},
        "K": jnp.asarray(t[("K", 0)].numpy()),
        "inv_K": jnp.asarray(t[("inv_K", 0)].numpy()),
        "doj_mask": jnp.asarray(t["doj_mask"].numpy()[:, 0]),
        "doj_mask-1": jnp.asarray(t["doj_mask-1"].numpy()[:, 0]),
        "doj_mask+1": jnp.asarray(t["doj_mask+1"].numpy()[:, 0]),
    }

    model = DynDepthModel(cfg)
    loss_fn = make_dynamic_loss_fn(cfg, model)

    normal_orig = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(
        shape, dtype)
    try:
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, jnp.asarray(ref_side["min_bin"]),
            jnp.asarray(ref_side["max_bin"]), batch,
            jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    finally:
        jax.random.normal = normal_orig

    return {"loss": float(total), "grads": grads, "gref": gref}


def test_dynamic_loss_matches_reference(ref_side, jax_side):
    # rtol is wider than the ManyDepth oracle's 1e-4: the DynamicDepth loss
    # runs through BINARY masks on fp32 features (automask argmin, the
    # selec_reproj black-hole test, the cv_min==1.0 saturation), and on
    # random-weight features a ~1e-7 framework difference flips a handful
    # of boundary pixels (measured residual 1.2e-4 rel with matching grads)
    assert np.isfinite(jax_side["loss"])
    np.testing.assert_allclose(jax_side["loss"], ref_side["loss"],
                               rtol=5e-4, atol=1e-6)


def test_dynamic_grads_match_reference(ref_side, jax_side):
    import jax

    flat_ours = jax.tree_util.tree_flatten_with_path(jax_side["grads"])[0]
    ref_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
               jax.tree_util.tree_flatten_with_path(jax_side["gref"])[0]}

    # same fp32-noise gating as the ManyDepth oracle (see
    # tests/test_ref_oracle_grads.py for the calibration)
    global_scale = max(np.abs(r).max() for r in ref_map.values())
    checked, failures = 0, []
    for key, g in flat_ours:
        name = jax.tree_util.keystr(key)
        r = ref_map.get(name)
        assert r is not None, f"missing reference grad for {name}"
        g = np.asarray(g)
        assert g.shape == r.shape, name
        denom = max(np.abs(r).max(), np.abs(g).max())
        if denom < 1e-12:
            checked += 1
            continue
        err = np.abs(g - r).max()
        cos = float((g.ravel() @ r.ravel())
                    / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-30))
        # global gate 2e-3: see test_ref_oracle_grads.py — 5e-4 straddled
        # the per-process fp32 noise band of the pose-branch gradients
        if err / global_scale > 2e-3 and (err / denom > 5e-3 or cos < 0.9999):
            failures.append(f"{name}: rel={err / denom:.2e} cos={cos:.6f} "
                            f"gerr={err / global_scale:.2e}")
        checked += 1

    assert checked > 100, f"only {checked} gradient tensors compared"
    assert not failures, "gradient mismatches:\n" + "\n".join(failures[:20])
