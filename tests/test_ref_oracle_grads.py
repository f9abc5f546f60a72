"""Gradient-level parity oracle vs the reference's OWN training code.

The eval oracles (test_ref_oracle_manydepth.py) validate the *inference*
path against `/root/reference`; this module validates the TRAINING
computation: it constructs the reference's own `Trainer`
(`manydepth/trainer.py:119-350`), runs one `process_batch` + `backward`
(`trainer.py:555-644`, the per-step work of `run_epoch`), converts the
resulting per-parameter gradients with the same state-dict converter used
for weights, and asserts they match `jax.grad` of `mal_tpu`'s
`make_loss_fn` on the identical weights and batch tensors.

Determinism notes:
- The reference applies matching augmentation UNCONDITIONALLY with Python's
  `random.random()` (`repdepth.py:278-295` — `--no_matching_augmentation`
  only gates the non-distil mask in `trainer.py:1328`, not the augmentation
  itself), so the fixture pins `random.random` to 0.9 (> 0.5: neither
  augmentation branch fires) and passes `--no_matching_augmentation` so the
  mal_tpu model takes the same no-augmentation path.
- The automask tie-break noise (`loss_utils.py:105,178`; `losses.py:160`,
  randn * 1e-5) is zeroed on BOTH sides via monkeypatching — it exists only
  to break exact reprojection ties, which cannot occur on random images,
  but different noise draws would flip near-tie argmins.
- `--loss_blc` is off: the plain `--distil` total (main + mono losses,
  `trainer.py:624-630`) keeps the oracle independent of balancer state.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims

install_reference_shims()

H, W = 96, 320
BATCH = 2


@pytest.fixture(scope="module")
def ref_side(tmp_path_factory):
    """Reference Trainer -> one training step's loss + per-parameter grads."""
    from accelerate import Accelerator

    from tests.ref_oracle.synth import make_kitti_tree

    root = tmp_path_factory.mktemp("grad_oracle")
    data, files = make_kitti_tree(root, BATCH * 3)
    sp = root / "splits" / "eigen_zhou"
    sp.mkdir(parents=True)
    (sp / "train_files.txt").write_text("\n".join(files) + "\n")
    (sp / "test_files.txt").write_text("\n".join(files[:2]) + "\n")
    (sp / "val_files.txt").write_text("\n".join(files[:2]) + "\n")

    from manydepth.options import MonodepthOptions
    from manydepth.trainer import Trainer

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", data, "--weights_init", "scratch",
        "--height", str(H), "--width", str(W), "--batch_size", str(BATCH),
        "--num_workers", "0", "--split", "eigen_zhou",
        "--distil", "--no_matching_augmentation",
    ])

    cwd = os.getcwd()
    os.chdir(root)  # trainer resolves ./splits and ./ckpt relative
    os.makedirs("ckpt", exist_ok=True)
    try:
        torch.manual_seed(0)
        acc = Accelerator(cpu=True)
        trainer = Trainer(opt, acc)
        trainer.epoch = 0
        trainer.step = 1
        trainer.model.train()

        import random as pyrandom

        randn_orig = torch.randn
        rand_orig = pyrandom.random
        # Pin Python-RNG draws BEFORE the loader fetch: the dataset's
        # do_color_aug/do_flip come from the (otherwise unseeded) global
        # `random`, so without this the oracle batch depends on how much
        # entropy earlier test modules consumed — the suite-order flake
        # fixed on 2026-08-18. 0.9 > 0.5 selects flip + color-aug
        # deterministically (both applied identically to both sides).
        pyrandom.random = lambda: 0.9  # + no matching augmentation below
        torch.randn = lambda *a, **k: torch.zeros(*a, **k)  # tie-break noise
        try:
            inputs = next(iter(trainer.train_loader))
            sd0 = {k: v.detach().clone()
                   for k, v in trainer.model.state_dict().items()}

            # bins used by the forward: the tracker EMA-updates DURING
            # process_batch (`trainer.py:634`), so capture before, not after
            min_bin = float(trainer.depth_bin_tracker.min_depth)
            max_bin = float(trainer.depth_bin_tracker.max_depth)

            outputs, ref_losses = trainer.process_batch(
                dict(inputs), 0, is_train=True)
            trainer.model_optimizer.zero_grad()
            ref_losses["loss"].backward()
        finally:
            torch.randn = randn_orig
            pyrandom.random = rand_orig

        named = dict(trainer.model.named_parameters())
        grads_sd = {}
        for k, v in sd0.items():
            p = named.get(k)
            if p is not None and p.grad is not None:
                grads_sd[k] = p.grad.detach().clone()
            else:
                # buffers / unused params: keep a converter-compatible value
                grads_sd[k] = (torch.zeros_like(v)
                               if v.dtype.is_floating_point else v)

        ck = root / "ck_weights"
        ck.mkdir()
        torch.save(sd0, ck / "model.pth")
        gk = root / "ck_grads"
        gk.mkdir()
        torch.save(grads_sd, gk / "model.pth")
    finally:
        os.chdir(cwd)

    return {
        "ckpt": str(ck),
        "gradckpt": str(gk),
        "inputs": inputs,
        "loss": float(ref_losses["loss"].detach()),
        "min_depth_bin": min_bin,
        "max_depth_bin": max_bin,
        "frame_ids": list(opt.frame_ids),
    }


def _nchw_to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def jax_side(ref_side):
    """jax.value_and_grad of make_loss_fn on the converted weights/batch."""
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.torch_weights import convert_mal_checkpoint_dir
    from mal_tpu.models import MALModel
    from mal_tpu.losses import LossBalancerState
    from mal_tpu.train.step import make_loss_fn

    cfg = Config(height=H, width=W, batch_size=BATCH, distil=True,
                 loss_blc=False, use_ensemble=True,
                 no_matching_augmentation=True, use_pallas=False)
    params, stats, _ = convert_mal_checkpoint_dir(ref_side["ckpt"], 18)
    gref, _, _ = convert_mal_checkpoint_dir(ref_side["gradckpt"], 18)

    inputs = ref_side["inputs"]
    batch = {
        "color": {str(f): jnp.asarray(_nchw_to_nhwc(inputs[("color", f, 0)]))
                  for f in ref_side["frame_ids"]},
        "color_aug": {
            str(f): jnp.asarray(_nchw_to_nhwc(inputs[("color_aug", f, 0)]))
            for f in ref_side["frame_ids"]},
        "K": jnp.asarray(inputs[("K", 0)].numpy()),
        "inv_K": jnp.asarray(inputs[("inv_K", 0)].numpy()),
    }

    model = MALModel(cfg)
    loss_fn = make_loss_fn(cfg, model)

    normal_orig = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(
        shape, dtype)  # tie-break noise, zeroed on the torch side too
    try:
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats,
            jnp.asarray(ref_side["min_depth_bin"]),
            jnp.asarray(ref_side["max_depth_bin"]),
            LossBalancerState.create(),
            batch, jax.random.PRNGKey(0), jax.random.PRNGKey(1),
            jnp.zeros(()))
    finally:
        jax.random.normal = normal_orig

    return {"loss": float(total), "grads": grads, "gref": gref,
            "metrics": jax.tree.map(float, aux["metrics"])}


def test_loss_matches_reference(ref_side, jax_side):
    assert np.isfinite(jax_side["loss"])
    np.testing.assert_allclose(jax_side["loss"], ref_side["loss"],
                               rtol=1e-4, atol=1e-6)


def test_grads_match_reference(ref_side, jax_side):
    import jax

    flat_ours = jax.tree_util.tree_flatten_with_path(jax_side["grads"])[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(jax_side["gref"])[0]
    ref_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_ref}

    # Both sides compute in fp32, and on tensors whose gradient is many
    # orders below the step's dominant gradients the backward is pure
    # cancellation noise on BOTH sides (measured: switching the jax side to
    # fp64 leaves torch-fp32 residuals up to rel 4e-2 at |g|~1e-7). Gate the
    # strict per-tensor check on the error's size relative to the step's
    # global gradient scale: a real semantic bug moves a tensor by >=1e-2 of
    # the global scale (the mono double-count bug this test caught measured
    # 2.7e-1), while fp32 noise stays below 1e-4 of it.
    global_scale = max(np.abs(r).max() for r in ref_map.values())
    checked = 0
    failures = []
    for key, g in flat_ours:
        name = jax.tree_util.keystr(key)
        r = ref_map.get(name)
        assert r is not None, f"missing reference grad for {name}"
        g = np.asarray(g)
        assert g.shape == r.shape, name
        denom = max(np.abs(r).max(), np.abs(g).max())
        if denom < 1e-12:  # both (near) zero — unused parameter
            checked += 1
            continue
        err = np.abs(g - r).max()
        rel = err / denom
        cos = float(
            (g.ravel() @ r.ravel())
            / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-30))
        # global gate 2e-3: per-process XLA:CPU variation moves the
        # pose-branch cancellation noise across ~5e-4 of the global scale
        # (observed 5.1-5.2e-4 excursions with cos >= 0.9999 in repeated
        # fresh-process runs), so a 5e-4 gate straddled the noise band;
        # real semantic bugs this oracle caught measured >=2.7e-1 (135x
        # above this gate)
        if err / global_scale > 2e-3 and (rel > 5e-3 or cos < 0.9999):
            failures.append(
                f"{name}: rel={rel:.2e} cos={cos:.6f} "
                f"gerr={err / global_scale:.2e}")
        checked += 1

    assert checked > 100, f"only {checked} gradient tensors compared"
    assert not failures, "gradient mismatches:\n" + "\n".join(failures[:20])
