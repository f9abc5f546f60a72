"""Mask2Former training criterion oracle vs the reference's OWN code.

Runs `/root/reference/mask2former/modeling/criterion.py` (SetCriterion) and
`matcher.py` (HungarianMatcher) directly — with the functional point_rend
shim from tests/ref_oracle/stubs.py — and asserts `mal_tpu.segment.criterion`
reproduces the matching and every loss term on identical inputs.

Randomness is aligned by injection: torch.rand is replaced by a FIFO of
pre-drawn arrays, and the same arrays are passed to the jax side through the
explicit `match_coords` / `loss_*_coords` overrides (mapped from the
reference's matched-pair ordering to the padded (batch, target) ordering).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.ref_oracle.stubs import expose_reference_mask2former_modeling

ref_criterion_mod, ref_matcher_mod = expose_reference_mask2former_modeling()

import jax
import jax.numpy as jnp

from mal_tpu.segment.criterion import (CriterionConfig, match_cost_matrix,
                                       match_one, point_sample,
                                       set_criterion, set_criterion_deep,
                                       weight_dict, weighted_total)

B, Q, K = 2, 20, 10          # batch, queries, classes
H = W = 24                   # mask resolution
T_SIZES = [3, 2]             # ragged target counts (reference side)
T_MAX = 4                    # static padding (jax side)
NUM_POINTS = 32
CFG = CriterionConfig(num_classes=K, num_points=NUM_POINTS)
N_OVER = int(NUM_POINTS * CFG.oversample_ratio)
N_UNC = int(CFG.importance_sample_ratio * NUM_POINTS)
N_RAND = NUM_POINTS - N_UNC


class _RandQueue:
    """FIFO replacement for torch.rand that records what it served."""

    def __init__(self, rng):
        self.rng = rng
        self.served = []

    def __call__(self, *shape, **kwargs):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        arr = self.rng.random(shape).astype(np.float32)
        self.served.append(arr)
        return torch.from_numpy(arr)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(2, B, Q, K + 1)).astype(np.float32)  # aux+final
    masks = rng.normal(size=(2, B, Q, H, W)).astype(np.float32) * 2.0
    labels = [rng.integers(0, K, size=(t,)) for t in T_SIZES]
    tmasks = [(rng.random((t, H, W)) > 0.6).astype(np.float32)
              for t in T_SIZES]
    return {"logits": logits, "masks": masks, "labels": labels,
            "tmasks": tmasks}


def _torch_outputs(problem, layer):
    return {"pred_logits": torch.from_numpy(problem["logits"][layer]),
            "pred_masks": torch.from_numpy(problem["masks"][layer])}


def _torch_targets(problem):
    return [{"labels": torch.from_numpy(l).long(),
             "masks": torch.from_numpy(m)}
            for l, m in zip(problem["labels"], problem["tmasks"])]


def _padded_targets(problem):
    lab = np.zeros((B, T_MAX), np.int32)
    msk = np.zeros((B, T_MAX, H, W), np.float32)
    val = np.zeros((B, T_MAX), bool)
    for b, (l, m) in enumerate(zip(problem["labels"], problem["tmasks"])):
        lab[b, :len(l)] = l
        msk[b, :len(l)] = m
        val[b, :len(l)] = True
    return jnp.asarray(lab), jnp.asarray(msk), jnp.asarray(val)


def _ref_matcher():
    return ref_matcher_mod.HungarianMatcher(
        cost_class=CFG.cost_class, cost_mask=CFG.cost_mask,
        cost_dice=CFG.cost_dice, num_points=NUM_POINTS)


def test_point_sample_matches_grid_sample(problem):
    """Our bilinear point sampler == torch grid_sample(align_corners=False),
    including out-of-range zero padding."""
    rng = np.random.default_rng(3)
    m = problem["masks"][0, 0, :4]                      # (4, H, W)
    # includes points near the border where one corner pads with zeros
    coords = rng.random((4, 50, 2)).astype(np.float32)
    coords[:, :5] *= 0.02
    coords[:, 5:10] = 1.0 - coords[:, 5:10] * 0.02
    ours = point_sample(jnp.asarray(m), jnp.asarray(coords))
    ref = ref_criterion_mod.point_sample(
        torch.from_numpy(m).unsqueeze(1), torch.from_numpy(coords),
        align_corners=False).squeeze(1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_matcher_matches_reference(problem):
    """Same shared-point cost matrices -> same optimal assignment (compared
    by total cost, which is tie-robust) as the reference HungarianMatcher."""
    rq = _RandQueue(np.random.default_rng(11))
    orig = torch.rand
    torch.rand = rq
    try:
        indices = _ref_matcher()(_torch_outputs(problem, 1),
                                 _torch_targets(problem))
    finally:
        torch.rand = orig

    lab, msk, val = _padded_targets(problem)
    match_coords = jnp.asarray(np.stack([a[0] for a in rq.served]))  # (B,P,2)

    for b in range(B):
        Tb = T_SIZES[b]
        pred_pts = point_sample(
            jnp.asarray(problem["masks"][1, b]),
            jnp.broadcast_to(match_coords[b], (Q, NUM_POINTS, 2)))
        tgt_pts = point_sample(
            msk[b], jnp.broadcast_to(match_coords[b],
                                     (T_MAX, NUM_POINTS, 2)))
        cost = match_cost_matrix(jnp.asarray(problem["logits"][1, b]),
                                 pred_pts, lab[b], tgt_pts, CFG)
        src = np.asarray(match_one(cost, val[b]))[:Tb]

        ref_src, ref_tgt = indices[b]
        cost_np = np.asarray(cost)[:, :Tb]
        ours_total = cost_np[src, np.arange(Tb)].sum()
        ref_total = cost_np[ref_src.numpy(), ref_tgt.numpy()].sum()
        assert len(set(src.tolist())) == Tb              # distinct queries
        np.testing.assert_allclose(ours_total, ref_total, rtol=1e-5,
                                   atol=1e-6)


def _run_reference_criterion(problem, rq):
    crit = ref_criterion_mod.SetCriterion(
        K, _ref_matcher(), weight_dict={}, eos_coef=CFG.eos_coef,
        losses=["labels", "masks"], num_points=NUM_POINTS,
        oversample_ratio=CFG.oversample_ratio,
        importance_sample_ratio=CFG.importance_sample_ratio)
    outputs = _torch_outputs(problem, 1)
    outputs["aux_outputs"] = [_torch_outputs(problem, 0)]
    orig = torch.rand
    torch.rand = rq
    try:
        losses = crit(outputs, _torch_targets(problem))
        # re-run the matcher per layer with the same injected points to
        # recover the pair ordering the loss coords were served against
        torch.rand = _RandQueue(np.random.default_rng(11))
        idx_final = _ref_matcher()(_torch_outputs(problem, 1),
                                   _torch_targets(problem))
        torch.rand = _RandQueue(np.random.default_rng(13))
        idx_aux = _ref_matcher()(_torch_outputs(problem, 0),
                                 _torch_targets(problem))
    finally:
        torch.rand = orig
    return ({k: float(v) for k, v in losses.items()}, idx_final, idx_aux)


def _coords_for_jax(served, indices):
    """Map the reference's per-matched-pair coord arrays (ordered by the
    criterion's concatenated (image, sorted-src) pair order) into the padded
    (B, T_MAX) row ordering -> (B*T_MAX, n, 2) arrays."""
    over = np.full((B * T_MAX, N_OVER, 2), 0.5, np.float32)
    rand = np.full((B * T_MAX, N_RAND, 2), 0.5, np.float32)
    k = 0
    for b in range(B):
        _, tgt = indices[b]
        for t in tgt.numpy():
            over[b * T_MAX + int(t)] = served[0][k]
            rand[b * T_MAX + int(t)] = served[1][k]
            k += 1
    assert k == sum(T_SIZES)
    return jnp.asarray(over), jnp.asarray(rand)


def test_criterion_losses_match_reference(problem):
    """All six loss terms (final + one aux layer) vs the reference
    SetCriterion on identical inputs and injected sample points."""
    # torch.rand call order inside criterion.forward:
    #   matcher(final) per image (B calls) -> get_uncertain oversample +
    #   random (2 calls) -> matcher(aux) per image (B) -> oversample+random
    seq = []
    for seed in (11, 101, 13, 103):
        seq.append(np.random.default_rng(seed))

    class _Seq:
        def __init__(self):
            self.phase_calls = 0
            self.queues = [_RandQueue(seq[0]), _RandQueue(seq[1]),
                           _RandQueue(seq[2]), _RandQueue(seq[3])]
            # phases: 0 matcher-final (B calls), 1 loss-final (2 calls),
            #         2 matcher-aux (B calls), 3 loss-aux (2 calls)
            self.plan = [B, 2, B, 2]
            self.phase = 0

        def __call__(self, *a, **k):
            out = self.queues[self.phase](*a, **k)
            self.phase_calls += 1
            if self.phase_calls == self.plan[self.phase]:
                self.phase += 1
                self.phase_calls = 0
            return out

    sq = _Seq()
    ref_losses, idx_final, idx_aux = _run_reference_criterion(problem, sq)

    lab, msk, val = _padded_targets(problem)
    match_final = jnp.asarray(np.stack([a[0] for a in sq.queues[0].served]))
    match_aux = jnp.asarray(np.stack([a[0] for a in sq.queues[2].served]))
    over_f, rand_f = _coords_for_jax(sq.queues[1].served, idx_final)
    over_a, rand_a = _coords_for_jax(sq.queues[3].served, idx_aux)

    key = jax.random.PRNGKey(0)  # unused: all draws injected
    ours_final = set_criterion(
        key, jnp.asarray(problem["logits"][1]),
        jnp.asarray(problem["masks"][1]), lab, msk, val, CFG,
        match_coords=match_final, loss_oversample_coords=over_f,
        loss_rand_coords=rand_f)
    ours_aux = set_criterion(
        key, jnp.asarray(problem["logits"][0]),
        jnp.asarray(problem["masks"][0]), lab, msk, val, CFG,
        match_coords=match_aux, loss_oversample_coords=over_a,
        loss_rand_coords=rand_a)

    for k_ref, ours in [("loss_ce", ours_final["loss_ce"]),
                        ("loss_mask", ours_final["loss_mask"]),
                        ("loss_dice", ours_final["loss_dice"]),
                        ("loss_ce_0", ours_aux["loss_ce"]),
                        ("loss_mask_0", ours_aux["loss_mask"]),
                        ("loss_dice_0", ours_aux["loss_dice"])]:
        np.testing.assert_allclose(
            float(ours), ref_losses[k_ref], rtol=2e-4, atol=1e-5,
            err_msg=k_ref)


def test_padding_invariance(problem):
    """Extra padded target slots change nothing: T_MAX=4 vs T_MAX=6 give
    identical losses when the injected per-valid-pair points agree."""
    lab4, msk4, val4 = _padded_targets(problem)
    lab6 = jnp.zeros((B, 6), jnp.int32).at[:, :T_MAX].set(lab4)
    msk6 = jnp.zeros((B, 6, H, W)).at[:, :T_MAX].set(msk4)
    val6 = jnp.zeros((B, 6), bool).at[:, :T_MAX].set(val4)

    rng = np.random.default_rng(5)
    match_c = jnp.asarray(rng.random((B, NUM_POINTS, 2)), jnp.float32)
    over4 = rng.random((B * T_MAX, N_OVER, 2)).astype(np.float32)
    rand4 = rng.random((B * T_MAX, N_RAND, 2)).astype(np.float32)
    over6 = np.full((B * 6, N_OVER, 2), 0.5, np.float32)
    rand6 = np.full((B * 6, N_RAND, 2), 0.5, np.float32)
    for b in range(B):
        over6[b * 6:b * 6 + T_MAX] = over4[b * T_MAX:(b + 1) * T_MAX]
        rand6[b * 6:b * 6 + T_MAX] = rand4[b * T_MAX:(b + 1) * T_MAX]

    key = jax.random.PRNGKey(0)
    args1 = (jnp.asarray(problem["logits"][1]),
             jnp.asarray(problem["masks"][1]))
    l4 = set_criterion(key, *args1, lab4, msk4, val4, CFG,
                       match_coords=match_c,
                       loss_oversample_coords=jnp.asarray(over4),
                       loss_rand_coords=jnp.asarray(rand4))
    l6 = set_criterion(key, *args1, lab6, msk6, val6, CFG,
                       match_coords=match_c,
                       loss_oversample_coords=jnp.asarray(over6),
                       loss_rand_coords=jnp.asarray(rand6))
    for k in l4:
        np.testing.assert_allclose(float(l4[k]), float(l6[k]), rtol=1e-6,
                                   err_msg=k)


@pytest.mark.slow
def test_mask2former_finetune_step():
    """End-to-end: tiny Mask2Former forward with deep supervision, criterion
    loss, one SGD step on the backbone params — the fine-tuning path the
    reference trains with (`maskformer_model.py:198-216`)."""
    from mal_tpu.segment.mask2former import (Mask2Former,
                                             mask2former_train_loss)

    model = Mask2Former(num_classes=5, swin_size="tiny", num_queries=8)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    tgt_labels = jnp.asarray([[1, 3]], jnp.int32)
    tm = np.zeros((1, 2, 64, 96), np.float32)
    tm[0, 0, :32] = 1.0
    tm[0, 1, 32:, :48] = 1.0
    tgt_masks = jnp.asarray(tm)
    tgt_valid = jnp.asarray([[True, True]])
    cfg = CriterionConfig(num_classes=5, num_points=64)

    def total(v):
        t, _ = mask2former_train_loss(model, v, images, tgt_labels,
                                      tgt_masks, tgt_valid,
                                      jax.random.PRNGKey(1), cfg)
        return t

    loss, grads = jax.jit(jax.value_and_grad(total))(vars_)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gmax = jax.tree.reduce(
        max, jax.tree.map(lambda g: float(jnp.abs(g).max()), grads))
    assert np.isfinite(gmax) and gmax > 0
    # a small step along -grad reduces the loss on this batch
    v2 = jax.tree.map(lambda p, g: p - 1e-6 * g, vars_, grads)
    assert float(total(v2)) < float(loss)


def test_deep_supervision_and_grads(problem):
    """set_criterion_deep jits, and the weighted total has finite nonzero
    gradients w.r.t. the predictions (the fine-tuning objective)."""
    lab, msk, val = _padded_targets(problem)
    weights = weight_dict(CFG, num_aux_layers=1)

    def total(logits, masks):
        losses = set_criterion_deep(jax.random.PRNGKey(2), logits, masks,
                                    lab, msk, val, CFG)
        return weighted_total(losses, weights)

    g_logits, g_masks = jax.jit(jax.grad(total, argnums=(0, 1)))(
        jnp.asarray(problem["logits"]), jnp.asarray(problem["masks"]))
    assert np.isfinite(np.asarray(g_logits)).all()
    assert np.isfinite(np.asarray(g_masks)).all()
    assert float(jnp.abs(g_logits).max()) > 0
    assert float(jnp.abs(g_masks).max()) > 0
