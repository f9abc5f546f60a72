"""DualRefine gradient-level oracle vs the reference's OWN training code.

Completes the per-method gradient-oracle set (ManyDepth:
tests/test_ref_oracle_grads.py, DynamicDepth: ..._grads_dynamic.py): builds
the reference DualRefine `Trainer` (`dualrefine/trainer.py:57-200`), runs
one `process_batch` + `losses["loss"].backward()` — the DEQ forward
(Anderson solve with in-loop Gauss-Newton pose updates), min-update-norm
pose pick, phantom-gradient taps, the (scales 0/2/3) x (deq_iter 0..n)
reprojection/consistency/smoothness losses over BOTH frames, and the
pose-update loss — and asserts loss + per-parameter gradients match
`jax.value_and_grad` of `mal_tpu.dualref.step.make_dualref_loss_fn`.

Upstream breakage shimmed to run the reference (each is the reference's
own code once past the bug; documented in PARITY.md):
- the Trainer passes `opt` as a leading dataset arg the shipped MonoDataset
  does not accept (`trainer.py:130-133`) — dropped via a subclass;
- `pose_update_generate_images_pred` ends in a leftover debug
  `print(...); exit(0)` (`trainer.py:...`) AFTER computing its outputs —
  `builtins.exit` is no-op'd (and the print captured);
- `--disable_wnorm` is passed so the torch parameter space is plain conv
  weights like mal's (DEQ weight-norm reparameterizes update-block weights
  as weight_g/weight_v, whose gradients live in a different space; the
  forward is identical either way, which the eval oracle covers WITH
  weight norm).

Determinism: `random.random` -> 0.9 and tie-break `randn` zeroed on both
sides, like the other two oracles.
"""

from __future__ import annotations

import builtins
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import install_reference_shims
from tests.ref_oracle.synth import make_kitti_tree, write_split

install_reference_shims()

H, W = 96, 320
BATCH = 2
N_IMAGES = 3


@pytest.fixture(scope="module")
def ref_side(tmp_path_factory):
    root = tmp_path_factory.mktemp("dref_grad_oracle")
    data, files = make_kitti_tree(root, N_IMAGES)
    sp = write_split(root, "eigen_zhou", files)
    (sp / "train_files.txt").write_text("\n".join(files) + "\n")
    (sp / "val_files.txt").write_text("\n".join(files) + "\n")

    from dualrefine import datasets as ref_datasets
    from dualrefine.options import MonodepthOptions
    from dualrefine import trainer as ref_trainer_mod

    _OrigKITTI = ref_datasets.KITTIRAWDataset

    class _KITTINoOpt(_OrigKITTI):
        def __init__(self, opt, *a, **k):
            super().__init__(*a, **k)

    opt = MonodepthOptions().parser.parse_args([
        "--data_path", data, "--weights_init", "scratch",
        "--height", str(H), "--width", str(W),
        "--split", "eigen_zhou", "--batch_size", str(BATCH),
        "--num_workers", "0", "--log_dir", str(root / "log"), "--no_cuda",
        "--disable_wnorm",
    ])
    opt.load_weights_folder = None
    opt.mono_weights_folder = None

    cwd = os.getcwd()
    ref_datasets.KITTIRAWDataset = _KITTINoOpt
    exit_orig = builtins.exit
    os.chdir(root)
    try:
        torch.manual_seed(7)
        trainer = ref_trainer_mod.Trainer(opt)
        trainer.set_train()
        import random as pyrandom

        builtins.exit = lambda *a, **k: None  # leftover debug exit(0)
        randn_orig, rand_orig = torch.randn, pyrandom.random
        torch.randn = lambda *a, **k: torch.zeros(*a, **k)
        # pinned BEFORE the loader fetch: the dataset's do_color_aug/do_flip
        # draws come from the unseeded global `random`, so the oracle batch
        # would otherwise depend on suite order (flake fixed 2026-08-18)
        pyrandom.random = lambda: 0.9
        try:
            inputs = next(iter(trainer.train_loader))
            snap = {k: v.detach().clone() for k, v in inputs.items()
                    if torch.is_tensor(v)}
            sd0 = {k: v.detach().clone() for k, v in
                   trainer.models["depth_pose"].state_dict().items()}
            outputs, losses = trainer.process_batch(inputs)
            trainer.model_optimizer.zero_grad()
            losses["loss"].backward()
        finally:
            torch.randn, pyrandom.random = randn_orig, rand_orig

        def save_dir(name, tensors):
            d = root / name
            d.mkdir()
            sd = dict(tensors)
            sd["min_depth_bin"] = torch.tensor(0.1)
            sd["max_depth_bin"] = torch.tensor(10.0)
            sd["mean_depth_bin"] = torch.tensor(1.0)
            sd["median_depth_bin"] = torch.tensor(1.0)
            sd["height"] = H
            sd["width"] = W
            torch.save(sd, d / "depth_pose.pth")
            return str(d)

        named = dict(trainer.models["depth_pose"].named_parameters())
        grads = {}
        for k, v in sd0.items():
            p = named.get(k)
            grads[k] = (p.grad.detach().clone()
                        if (p is not None and p.grad is not None)
                        else (torch.zeros_like(v)
                              if v.dtype.is_floating_point else v))
        ck = save_dir("ck_weights", sd0)
        gk = save_dir("ck_grads", grads)
    finally:
        os.chdir(cwd)
        builtins.exit = exit_orig
        ref_datasets.KITTIRAWDataset = _OrigKITTI

    return {"ckpt": ck, "gradckpt": gk, "inputs": snap,
            "loss": float(losses["loss"].detach())}


def _nchw_to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.ascontiguousarray(t.detach().numpy().transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def jax_side(ref_side):
    import jax
    import jax.numpy as jnp

    from mal_tpu.config import Config
    from mal_tpu.convert.dualref import convert_dualrefine_checkpoint_dir
    from mal_tpu.dualref.model import DEQDepthPose
    from mal_tpu.dualref.step import make_dualref_loss_fn

    cfg = Config(method="dualrefine", height=H, width=W, batch_size=BATCH,
                 frame_ids=(0, -1, 1), use_pallas=False)
    conv = convert_dualrefine_checkpoint_dir(ref_side["ckpt"])
    params, stats = conv[0], conv[1]
    gconv = convert_dualrefine_checkpoint_dir(ref_side["gradckpt"])
    gref = gconv[0]

    t = ref_side["inputs"]
    batch = {
        "color": {str(f): jnp.asarray(_nchw_to_nhwc(t[("color", f, 0)]))
                  for f in (0, -1, 1)},
        "color_aug": {
            str(f): jnp.asarray(_nchw_to_nhwc(t[("color_aug", f, 0)]))
            for f in (0, -1, 1)},
        "K": jnp.asarray(t[("K", 0)].numpy()),
        "inv_K": jnp.asarray(t[("inv_K", 0)].numpy()),
        # dataset pyramid colors for the scale-2/3 smoothness edges (the
        # reference resizes with PIL ANTIALIAS, not bilinear)
        "color_s2": jnp.asarray(_nchw_to_nhwc(t[("color", 0, 2)])),
        "color_s3": jnp.asarray(_nchw_to_nhwc(t[("color", 0, 3)])),
    }

    model = DEQDepthPose(cfg)
    loss_fn = make_dualref_loss_fn(cfg, model)

    normal_orig = jax.random.normal
    jax.random.normal = lambda key, shape, dtype=jnp.float32: jnp.zeros(
        shape, dtype)
    try:
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats, batch, jax.random.PRNGKey(1))
    finally:
        jax.random.normal = normal_orig

    return {"loss": float(total), "grads": grads, "gref": gref,
            "params": params}


def test_dualref_loss_matches_reference(ref_side, jax_side):
    assert np.isfinite(jax_side["loss"])
    np.testing.assert_allclose(jax_side["loss"], ref_side["loss"],
                               rtol=2e-4, atol=1e-6)


def test_dualref_grads_match_reference(ref_side, jax_side):
    import jax

    flat_ours = jax.tree_util.tree_flatten_with_path(jax_side["grads"])[0]
    ref_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
               jax.tree_util.tree_flatten_with_path(jax_side["gref"])[0]}
    ours_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_ours}
    par_map = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
               jax.tree_util.tree_flatten_with_path(jax_side["params"])[0]}

    # mal's update block uses weight-norm (v, g) parameters to match the
    # reference's DEFAULT checkpoint layout; this oracle runs the torch side
    # with --disable_wnorm (plain weights w), and the converter decomposes
    # w -> (v=w, g=||w||). Gradients live in different spaces, so map mal's
    # (dL/dv, dL/dg) back through that decomposition:
    #   dL/dw = dL/dv + dL/dg * v/||v||   (per output channel, axis -1)
    # and compare against torch's dL/dw (= the grads tree's 'v' entry).
    def reconstruct_w_grad(name_v):
        name_g = name_v[:-len("['v']")] + "['g']"
        gv, gg = ours_map[name_v], ours_map[name_g]
        v = par_map[name_v]
        norm = np.sqrt((v * v).sum(axis=(0, 1, 2), keepdims=True)) + 1e-12
        return gv + gg[None, None, None, :] * (v / norm)

    # fp32-noise gating calibrated like the other two oracles (see
    # tests/test_ref_oracle_grads.py); the DEQ pipeline additionally runs
    # 8+ solver evaluations with a Cholesky pose solve, so per-tensor noise
    # floors are higher — gate on the global gradient scale
    global_scale = max(np.abs(r).max() for r in ref_map.values())
    checked, failures = 0, []
    for key, g in flat_ours:
        name = jax.tree_util.keystr(key)
        r = ref_map.get(name)
        if r is None:
            # converter-side extras absent from the grads tree
            continue
        g = np.asarray(g)
        if name.endswith("['g']") and name[:-len("['g']")] + "['v']" in ours_map:
            continue  # folded into the 'v' comparison below
        if name.endswith("['v']") and name[:-len("['v']")] + "['g']" in ours_map:
            g = reconstruct_w_grad(name)
        assert g.shape == r.shape, name
        denom = max(np.abs(r).max(), np.abs(g).max())
        if denom < 1e-12:
            checked += 1
            continue
        err = np.abs(g - r).max()
        cos = float((g.ravel() @ r.ravel())
                    / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-30))
        # global gate 5e-3: the pose branch behind the GN/DEQ solve is the
        # most ill-conditioned path — per-process XLA:CPU variation was
        # observed pushing its cancellation noise to gerr 1.9e-3 with
        # cos >= 0.999 (fresh-process reruns of the full oracle set), so
        # the old 1e-3 gate straddled the noise band; the seven real
        # semantic bugs this oracle caught all measured orders above this
        if err / global_scale > 5e-3 and (err / denom > 1e-2 or cos < 0.999):
            failures.append(f"{name}: rel={err / denom:.2e} cos={cos:.6f} "
                            f"gerr={err / global_scale:.2e}")
        checked += 1

    assert checked > 200, f"only {checked} gradient tensors compared"
    assert not failures, "gradient mismatches:\n" + "\n".join(failures[:20])
