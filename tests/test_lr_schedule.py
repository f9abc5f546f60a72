"""Warmup-step LR schedule vs the reference `WarmupStepLRScheduler`
semantics (`manydepth/lr_scheduler.py:30-71`): linear ramp init->peak over
warmup_steps, then x0.1 every decay_steps."""

import numpy as np

from mal_tpu.train.lr_schedule import warmup_step_schedule


def test_warmup_ramp_and_decay():
    init, peak, warm, decay = 1e-10, 1e-4, 500, 48000
    sched = warmup_step_schedule(init, peak, warm, decay)

    assert float(sched(0)) == np.float32(init)
    # mid-warmup: linear interpolation
    np.testing.assert_allclose(float(sched(250)),
                               init + (peak - init) * 0.5, rtol=1e-6)
    # end of warmup and the long plateau: peak lr
    np.testing.assert_allclose(float(sched(warm)), peak, rtol=1e-6)
    np.testing.assert_allclose(float(sched(47999)), peak, rtol=1e-6)
    # one decay period: x0.1
    np.testing.assert_allclose(float(sched(48000)), peak * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(96000)), peak * 0.01, rtol=1e-6)


def test_zero_warmup_stays_at_init():
    """warmup_steps=0 never ramps in the reference (`lr_scheduler.py:49-52`:
    warmup_rate=0, `step` only updates lr inside the warmup window)."""
    sched = warmup_step_schedule(1e-6, 1e-4, 0, 1000)
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(sched(999)), 1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1000)), 1e-7, rtol=1e-6)


def test_step_lr_schedule_per_epoch_decay():
    """torch StepLR(step_size, 0.1) stepped per epoch
    (`dualrefine/trainer.py:104-105,272`): lr = peak * 0.1^(epoch//size)."""
    from mal_tpu.train.lr_schedule import step_lr_schedule

    s = step_lr_schedule(1e-4, step_size_epochs=2, steps_per_epoch=10)
    import numpy as np
    np.testing.assert_allclose(float(s(0)), 1e-4)
    np.testing.assert_allclose(float(s(19)), 1e-4)    # epoch 1 — no decay
    np.testing.assert_allclose(float(s(20)), 1e-5)    # epoch 2 — decayed
    np.testing.assert_allclose(float(s(45)), 1e-6)    # epoch 4
    import pytest
    with pytest.raises(ValueError):
        step_lr_schedule(1e-4, 2, 0)


def test_make_optimizer_scheduler_selection():
    from mal_tpu.config import Config
    from mal_tpu.train.state import make_optimizer

    import pytest
    make_optimizer(Config(lr_scheduler="step", steps_per_epoch=10))
    with pytest.raises(ValueError):
        make_optimizer(Config(lr_scheduler="step"))  # steps_per_epoch unset
    with pytest.raises(NotImplementedError):
        make_optimizer(Config(lr_scheduler="cos"))  # broken upstream
