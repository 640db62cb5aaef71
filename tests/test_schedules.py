"""Schedule math: jnp schedules vs the native C++ schedulers (ctypes)."""

import numpy as np
import pytest

from vqvae_tpu.train.native_schedulers import (
    CosineScheduler,
    LinearCosineScheduler,
    LinearScheduler,
)
from vqvae_tpu.train.schedules import (
    build_gumbel_schedules,
    build_lr_schedule,
    cosine_schedule,
    linear_cosine_schedule,
    linear_schedule,
)

STEPS = np.linspace(-10, 1200, 60)


def test_linear_parity_native():
    native = LinearScheduler(0, 1000, 1e-20, 1e-4)
    sched = linear_schedule(0, 1000, 1e-20, 1e-4)
    for s in STEPS:
        assert float(sched(s)) == pytest.approx(native.step(s), rel=1e-6)
    native.destroy()


def test_cosine_parity_native():
    native = CosineScheduler(0, 1000, 1e-4, 5e-5)
    sched = cosine_schedule(0, 1000, 1e-4, 5e-5)
    for s in STEPS:
        assert float(sched(s)) == pytest.approx(native.step(s), rel=1e-6)
    native.destroy()


def test_linear_cosine_parity_native():
    native = LinearCosineScheduler(0, 1000, 1e-4, 5e-5, 100)
    sched = linear_cosine_schedule(0, 1000, 1e-4, 5e-5, 100)
    for s in STEPS:
        assert float(sched(s)) == pytest.approx(native.step(s), rel=1e-6)
    native.destroy()


def test_cosine_endpoints():
    sched = cosine_schedule(0, 100, 1.0, 0.5)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(0.75)
    assert float(sched(100)) == pytest.approx(0.5)
    assert float(sched(500)) == pytest.approx(0.5)  # clamped after decay


def test_build_lr_schedule_dispatch():
    # decay only -> cosine lr -> lr/2 (reference model.py:183-187)
    s = build_lr_schedule(2e-4, 10, None, 250.0)
    assert float(s(0)) == pytest.approx(2e-4)
    assert float(s(2500)) == pytest.approx(1e-4)
    # neither -> constant
    s = build_lr_schedule(2e-4, 10, None, None)
    assert float(s(123456)) == pytest.approx(2e-4)


def test_gumbel_schedules():
    temp_s, kl_s = build_gumbel_schedules(
        temp=1.0, kl_cost=0.00859375, steps_per_epoch=100,
        kl_warmup_epochs=0.48, temp_decay_epochs=15, temp_final=0.0625)
    assert float(kl_s(0)) == pytest.approx(0.0)
    assert float(kl_s(48)) == pytest.approx(0.00859375)
    assert float(temp_s(0)) == pytest.approx(1.0)
    assert float(temp_s(1500)) == pytest.approx(0.0625)


def test_native_library_builds():
    """The C++ scheduler library should actually build and load here."""
    s = CosineScheduler(0, 10, 1.0, 0.0)
    assert s.is_native, "native scheduler library failed to build/load"
    s.destroy()
