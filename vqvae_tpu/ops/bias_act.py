"""Fused bias + activation + gain + clamp.

TPU equivalent of the reference's CUDA ``bias_act`` op (reference
…/stylegan2_discriminator/utils/ops/bias_act.py:23-123, bias_act.cu:23-147):
on TPU the whole chain is elementwise VPU work that XLA fuses into the
producing convolution/matmul, so the right design is a plain jnp expression —
a hand-written kernel would only re-implement what the fusion pass already
does. Gradients (including the 2nd-order path needed by R1 regularization)
come for free from JAX autodiff; no ``has_2nd_grad`` bookkeeping needed.

Activation table matches the reference exactly (names, default alpha/gain).
Images/activations are NHWC; ``b`` broadcasts over the trailing channel dim.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class _Act(NamedTuple):
    fn: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _Act(lambda x, alpha: x, 0.0, 1.0),
    "relu": _Act(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": _Act(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2)),
    "tanh": _Act(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
}


def bias_act(x: jnp.ndarray, b: Optional[jnp.ndarray] = None,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None,
             clamp: Optional[float] = None) -> jnp.ndarray:
    """y = clamp(gain * act(x + b)); channel dim is the last axis (NHWC)."""
    spec = activation_funcs[act]
    alpha = spec.def_alpha if alpha is None else float(alpha)
    gain = spec.def_gain if gain is None else float(gain)

    if b is not None:
        x = x + b.astype(x.dtype)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
