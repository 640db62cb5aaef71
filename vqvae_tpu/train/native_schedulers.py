"""ctypes bindings for the native C++ schedulers (csrc/schedulers.cpp).

Drop-in equivalents of the reference's external C++ dependency
``scheduling_utils.schedulers_cpp`` (reference model.py:6): objects with a
``step(current_step) -> value`` method and an explicit ``destroy()`` lifetime
(reference model.py:305-307). Auto-builds the shared library on first import
if the toolchain is available; falls back to pure-Python math (identical
semantics) otherwise.
"""

from __future__ import annotations

import ctypes
import math
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB_PATH = _NATIVE_DIR / "libvqvae_schedulers.so"
_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "schedulers.cpp"

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            _NATIVE_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-std=c++17", "-shared",
                 "-o", str(_LIB_PATH), str(_CSRC)],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    for name in ("scheduler_create_linear", "scheduler_create_cosine"):
        getattr(lib, name).restype = ctypes.c_void_p
        getattr(lib, name).argtypes = [ctypes.c_double] * 4
    lib.scheduler_create_linear_cosine.restype = ctypes.c_void_p
    lib.scheduler_create_linear_cosine.argtypes = [ctypes.c_double] * 5
    lib.scheduler_step.restype = ctypes.c_double
    lib.scheduler_step.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.scheduler_destroy.restype = None
    lib.scheduler_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


class _NativeScheduler:
    """Base wrapper with explicit destroy() lifetime (reference model.py:307)."""

    def __init__(self):
        self._handle = None
        self._py_step = None

    def step(self, current_step: float) -> float:
        if self._handle is not None:
            return _load_library().scheduler_step(self._handle, float(current_step))
        return self._py_step(float(current_step))

    def destroy(self):
        if self._handle is not None:
            _load_library().scheduler_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.destroy()
        except Exception:
            pass

    @property
    def is_native(self) -> bool:
        return self._handle is not None


def _linear_at(step, start, stop, v0, v1):
    t = min(max((step - start) / max(stop - start, 1e-9), 0.0), 1.0)
    return v0 + (v1 - v0) * t


def _cosine_at(step, start, stop, v0, v1):
    t = min(max((step - start) / max(stop - start, 1e-9), 0.0), 1.0)
    return v1 + (v0 - v1) * 0.5 * (1.0 + math.cos(math.pi * t))


class LinearScheduler(_NativeScheduler):
    def __init__(self, start_step, stop_step, v0, v1):
        super().__init__()
        lib = _load_library()
        if lib is not None:
            self._handle = lib.scheduler_create_linear(
                float(start_step), float(stop_step), float(v0), float(v1))
        else:
            self._py_step = lambda s: _linear_at(s, start_step, stop_step, v0, v1)


class CosineScheduler(_NativeScheduler):
    def __init__(self, start_step, stop_step, v0, v1):
        super().__init__()
        lib = _load_library()
        if lib is not None:
            self._handle = lib.scheduler_create_cosine(
                float(start_step), float(stop_step), float(v0), float(v1))
        else:
            self._py_step = lambda s: _cosine_at(s, start_step, stop_step, v0, v1)


class LinearCosineScheduler(_NativeScheduler):
    def __init__(self, start_step, stop_step, v_peak, v_end, warmup_end):
        super().__init__()
        lib = _load_library()
        if lib is not None:
            self._handle = lib.scheduler_create_linear_cosine(
                float(start_step), float(stop_step), float(v_peak),
                float(v_end), float(warmup_end))
        else:
            def py(s):
                if s < warmup_end:
                    return _linear_at(s, start_step, warmup_end, 0.0, v_peak)
                return _cosine_at(s, warmup_end, stop_step, v_peak, v_end)
            self._py_step = py


class ConstantScheduler(_NativeScheduler):
    def __init__(self, v):
        super().__init__()
        # constant has no native counterpart in scheduling_utils either;
        # trivial host math
        self._py_step = lambda s: float(v)


def build_native_lr_scheduler(lr: float, steps_per_epoch: int,
                              warmup_epochs, decay_epochs):
    """Host-side runtime-of-record for the LR value: the native (C++)
    scheduler twin of train.schedules.build_lr_schedule, same dispatch as the
    reference's on_train_start (model.py:163-187). The Trainer steps it on
    the host for the logged per-epoch LR and destroys it at train end
    (reference on_train_end, model.py:305-307); test_schedules pins it to the
    in-jit jnp schedule."""
    if warmup_epochs is not None and decay_epochs is not None:
        return LinearCosineScheduler(0.0, decay_epochs * steps_per_epoch,
                                     lr, lr / 2.0,
                                     warmup_epochs * steps_per_epoch)
    if warmup_epochs is not None:
        return LinearScheduler(0.0, warmup_epochs * steps_per_epoch, 1e-20, lr)
    if decay_epochs is not None:
        return CosineScheduler(0.0, decay_epochs * steps_per_epoch, lr, lr / 2.0)
    return ConstantScheduler(lr)
