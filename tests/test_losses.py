"""Loss-kernel tests: golden values + behavioral probes."""

import jax
import jax.numpy as jnp
import numpy as np

from mal_tpu import losses
from mal_tpu.eval.metrics import compute_depth_errors_np


def test_reprojection_loss_zero_for_identical():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    out = losses.reprojection_loss(img, img)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_smooth_loss_flat_disp_is_zero():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    assert float(losses.smooth_loss(disp, img)) == 0.0


def test_smooth_loss_edge_aware_downweights_edges():
    """Disparity gradient at a strong image edge is penalized less."""
    disp = jnp.zeros((1, 4, 8, 1)).at[:, :, 4:].set(1.0)
    img_flat = jnp.ones((1, 4, 8, 3)) * 0.5
    img_edge = img_flat.at[:, :, 4:].set(1.0)  # edge aligned with disp jump
    l_flat = float(losses.smooth_loss(disp, img_flat))
    l_edge = float(losses.smooth_loss(disp, img_edge))
    assert l_edge < l_flat


def test_automask_prefers_reprojection():
    reproj = jnp.full((1, 4, 4, 1), 0.2)
    identity = jnp.full((1, 4, 4, 1), 0.5)
    m = losses.automask(reproj, identity)
    np.testing.assert_allclose(np.asarray(m), 1.0)
    m2 = losses.automask(identity, reproj)
    np.testing.assert_allclose(np.asarray(m2), 0.0)


def test_matching_mask_2x_band():
    mono = jnp.full((1, 2, 2, 1), 4.0)
    # matching depth = 1/disp: 4 (agree), 20 (too far), 1 (too near), 7.9 (edge)
    lc = jnp.asarray([[[1 / 4.0, 1 / 20.0], [1 / 1.0, 1 / 7.9]]], jnp.float32)
    m = np.asarray(losses.matching_mask(mono, lc))
    assert m[0, 0, 0] == 1
    assert m[0, 0, 1] == 0   # (20-4)/4 = 4 >= 1
    assert m[0, 1, 0] == 0   # (4-1)/1 = 3 >= 1
    assert m[0, 1, 1] == 1   # (7.9-4)/4 < 1 and (4-7.9)/7.9 < 1


def test_mono_losses_identical_frames_automasked():
    """If warped == identity == target, automask noise picks ~half; loss ~0."""
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    disp = jnp.full((2, 16, 16, 1), 0.5)
    out = losses.mono_losses(jax.random.PRNGKey(0), disp, img, [img, img],
                             [img, img])
    assert float(out.reproj_loss) < 1e-5


def test_loss_balancer_init_equalizes_contributions():
    state = losses.LossBalancerState.create()
    ll = jnp.asarray([4.0, 1.0])
    total0, state1 = losses.loss_balance(state, ll, jnp.asarray(3.0))
    # first call uses the 0.5/0.5 init weights for the returned total
    np.testing.assert_allclose(float(total0), 2.5)
    # after init, w * mean is equal across terms
    contrib = np.asarray(state1.w) * np.asarray([4.0, 1.0])
    np.testing.assert_allclose(contrib[0], contrib[1], rtol=1e-5)

    # second call: weighted total with the new weights; adjustment bounded
    total1, state2 = losses.loss_balance(state1, ll, jnp.asarray(3.0))
    w1, w2 = np.asarray(state1.w), np.asarray(state2.w)
    assert np.all(w2 / w1 <= 2.0) and np.all(w2 / w1 >= 0.5)
    assert float(state2.count) == 2.0


def test_depth_errors_perfect_prediction():
    gt = np.random.RandomState(3).uniform(1, 50, 500).astype(np.float64)
    e = compute_depth_errors_np(gt, gt.copy())
    assert e["abs_rel"] == 0 and e["rmse"] == 0 and e["a1"] == 1.0


def test_depth_errors_known_offset():
    gt = np.full(100, 10.0)
    pred = np.full(100, 12.0)
    e = compute_depth_errors_np(gt, pred)
    np.testing.assert_allclose(e["abs_rel"], 0.2)
    np.testing.assert_allclose(e["sq_rel"], 0.4)
    np.testing.assert_allclose(e["rmse"], 2.0)
    assert e["a1"] == 1.0  # 1.2 < 1.25


def test_multi_loss_manager_init_and_adjust():
    """MultiLossManager (`manydepth/multilossmanager.py`): first rebalance
    initializes weights to equal contribution; later ones adjust bounded in
    [0.5, 2]."""
    from mal_tpu.losses import (MultiLossManagerState, multi_loss_rebalance,
                                multi_loss_total)

    st = MultiLossManagerState.create(3)
    np.testing.assert_allclose(np.asarray(st.w), [1 / 3] * 3, rtol=1e-6)

    losses_t = jnp.asarray([3.0, 1.0, 0.5])
    total, st = multi_loss_total(st, losses_t)
    np.testing.assert_allclose(float(total), float(jnp.sum(losses_t) / 3),
                               rtol=1e-6)

    st = multi_loss_rebalance(st, 1.0)
    # equal contribution: w_i * mean_i identical for all i
    contrib = np.asarray(st.w) * np.asarray(losses_t) / 3
    np.testing.assert_allclose(contrib, contrib[0], rtol=1e-5)

    # a second window with shifted losses adjusts within [0.5, 2]
    w_before = np.asarray(st.w)
    _, st = multi_loss_total(st, jnp.asarray([6.0, 1.0, 0.25]))
    st = multi_loss_rebalance(st, 1.0)
    ratio = np.asarray(st.w) / w_before
    assert np.all(ratio >= 0.5 - 1e-6) and np.all(ratio <= 2.0 + 1e-6)

    # update_once freezes the weights after initialization
    st2 = MultiLossManagerState.create(2)
    _, st2 = multi_loss_total(st2, jnp.asarray([2.0, 1.0]))
    st2 = multi_loss_rebalance(st2, 1.0, update_once=True)
    w_frozen = np.asarray(st2.w)
    _, st2 = multi_loss_total(st2, jnp.asarray([10.0, 1.0]))
    st2 = multi_loss_rebalance(st2, 1.0, update_once=True)
    np.testing.assert_allclose(np.asarray(st2.w), w_frozen, rtol=1e-6)


def test_avg_reprojection_is_source_mean():
    """--avg_reprojection (parsed by the reference, consumer commented out at
    `loss_utils.py:171` — implemented with the monodepth2 semantics it
    inherits): per-pixel MEAN over source frames replaces the min, for both
    the warped and the identity (automask) maps."""
    rng = jax.random.PRNGKey(3)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    img = jax.random.uniform(k1, (2, 16, 24, 3))
    w1 = jax.random.uniform(k2, (2, 16, 24, 3))
    w2 = jax.random.uniform(k3, (2, 16, 24, 3))
    disp = jax.random.uniform(k4, (2, 16, 24, 1))

    out_min = losses.mono_losses(jax.random.PRNGKey(0), disp, img, [w1, w2],
                                 [w2, w1])
    out_avg = losses.mono_losses(jax.random.PRNGKey(0), disp, img, [w1, w2],
                                 [w2, w1], avg_reprojection=True)
    want = (losses.reprojection_loss(w1, img)
            + losses.reprojection_loss(w2, img)) / 2.0
    np.testing.assert_allclose(np.asarray(out_avg.min_reproj),
                               np.asarray(want), rtol=1e-6)
    assert float(out_avg.loss) != float(out_min.loss)

    # multi path: the per-frame reduction averages, the 3-way distillation
    # argmin is untouched
    mono_d = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 24, 1)) + 0.5
    multi_d = mono_d * 1.1
    cmask = jnp.ones((2, 16, 24))
    aug = jnp.zeros((2, 1, 1, 1))
    m_avg = losses.multi_losses(disp, img, [w1, w2], multi_d, mono_d, cmask,
                                aug, out_avg.min_reproj,
                                avg_reprojection=True)
    m_min = losses.multi_losses(disp, img, [w1, w2], multi_d, mono_d, cmask,
                                aug, out_min.min_reproj)
    assert float(m_avg.reproj_loss) != float(m_min.reproj_loss)
    assert np.isfinite(float(m_avg.loss))
