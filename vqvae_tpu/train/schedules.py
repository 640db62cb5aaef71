"""Step-wise LR / constant schedules.

The reference drives per-step LR and gumbel temp/kl constants through an
external C++ package (``scheduling_utils.schedulers_cpp`` — reference
model.py:6,163-230): ``LinearScheduler``, ``CosineScheduler`` and
``LinearCosineScheduler`` objects stepped on every batch.

Here schedules are pure jnp functions of the global step so they evaluate
*inside* the jitted train step (scalar VPU math, no host round-trip and no
recompilation). A C++ implementation with identical semantics lives in
``csrc/schedulers.cpp`` (loaded via ctypes in
``vqvae_tpu.train.native_schedulers``) as the runtime-of-record for host-side
consumers; a parity test pins the two to each other.

Semantics (matching scheduling_utils):
- linear(start_step, stop_step, v0, v1): linear ramp, clamped outside range.
- cosine(start_step, stop_step, v0, v1): half-cosine from v0 to v1, clamped.
- linear_cosine(start, stop, v_peak, v_end, warmup_end): linear 0 -> v_peak on
  [start, warmup_end], cosine v_peak -> v_end on [warmup_end, stop].
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def linear_schedule(start_step: float, stop_step: float,
                    v0: float, v1: float) -> Schedule:
    def fn(step):
        t = (jnp.asarray(step, jnp.float32) - start_step) / max(stop_step - start_step, 1e-9)
        t = jnp.clip(t, 0.0, 1.0)
        return v0 + (v1 - v0) * t
    return fn


def cosine_schedule(start_step: float, stop_step: float,
                    v0: float, v1: float) -> Schedule:
    def fn(step):
        t = (jnp.asarray(step, jnp.float32) - start_step) / max(stop_step - start_step, 1e-9)
        t = jnp.clip(t, 0.0, 1.0)
        return v1 + (v0 - v1) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    return fn


def linear_cosine_schedule(start_step: float, stop_step: float,
                           v_peak: float, v_end: float,
                           warmup_end: float) -> Schedule:
    warm = linear_schedule(start_step, warmup_end, 0.0, v_peak)
    decay = cosine_schedule(warmup_end, stop_step, v_peak, v_end)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_end, warm(step), decay(step))
    return fn


def constant_schedule(v: float) -> Schedule:
    def fn(step):
        return jnp.full((), v, jnp.float32)
    return fn


def build_lr_schedule(lr: float, steps_per_epoch: int,
                      warmup_epochs: Optional[float],
                      decay_epochs: Optional[float]) -> Schedule:
    """LR schedule dispatch mirroring reference on_train_start
    (model.py:163-187): warmup+decay -> LinearCosine(lr -> lr/2); warmup only
    -> Linear(1e-20 -> lr); decay only -> Cosine(lr -> lr/2); neither ->
    constant lr.
    """
    if warmup_epochs is not None and decay_epochs is not None:
        return linear_cosine_schedule(
            0.0, decay_epochs * steps_per_epoch, lr, lr / 2.0,
            warmup_epochs * steps_per_epoch)
    if warmup_epochs is not None:
        return linear_schedule(0.0, warmup_epochs * steps_per_epoch, 1e-20, lr)
    if decay_epochs is not None:
        return cosine_schedule(0.0, decay_epochs * steps_per_epoch, lr, lr / 2.0)
    return constant_schedule(lr)


def build_gumbel_schedules(temp: float, kl_cost: float, steps_per_epoch: int,
                           kl_warmup_epochs: Optional[float],
                           temp_decay_epochs: Optional[float],
                           temp_final: Optional[float]):
    """(temp_schedule, kl_schedule) mirroring reference model.py:189-200."""
    if kl_warmup_epochs is not None:
        kl_sched = cosine_schedule(
            0.0, int(kl_warmup_epochs * steps_per_epoch), 0.0, kl_cost)
    else:
        kl_sched = constant_schedule(kl_cost)

    if temp_decay_epochs is not None and temp_final is not None:
        temp_sched = cosine_schedule(
            0.0, int(temp_decay_epochs * steps_per_epoch), temp, temp_final)
    else:
        temp_sched = constant_schedule(temp)

    return temp_sched, kl_sched
