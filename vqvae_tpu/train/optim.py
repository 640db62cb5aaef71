"""Optimizers: AdamW with the reference's decay/no-decay parameter split.

Parity with reference configure_optimizers (model.py:372-440):
- autoencoder optimizer: AdamW over encoder+decoder+quantizer params where
  weight decay applies only to Conv2d kernels; biases, GroupNorm scale/bias
  and the codebook embedding are excluded (karpathy-style split,
  model.py:373-410). In this framework conv kernels are exactly the 4-D
  params, so the split is a structural mask — no name lists needed.
- discriminator optimizer: AdamW with uniform weight decay on every
  parameter (model.py:431-434).

The LR schedule is evaluated from the optimizer's own step count (optax
schedule), replacing the reference's per-batch host-side
``scheduler.step(current_step)`` loop over param groups (model.py:202-216).
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def decay_mask(params) -> dict:
    """True where weight decay applies: conv kernels only (4-D params)."""
    return jax.tree.map(lambda p: p.ndim == 4, params)


class ScaleByAdamB1ZeroState(NamedTuple):
    count: jax.Array
    nu: optax.Updates


def scale_by_adam_b1zero(b2: float, eps: float,
                         eps_root: float = 0.0) -> optax.GradientTransformation:
    """``optax.scale_by_adam(b1=0, ...)`` with the first moment specialized
    away.

    The reference recipe trains every config with AdamW betas (0.0, 0.99)
    (example_confs/*.yaml, reference model.py:407-409,431-434). With b1 == 0
    Adam's first moment is identically the incoming gradient (mu_t =
    (1-0)*g + 0*mu = g; bias correction 1 - 0**t = 1), so storing ``mu``
    costs one fp32 array per parameter — ~384 MB of HBM capacity and
    ~770 MB/step of read+write traffic across the two optimizers at the
    72M-param flagship — for nothing. This transformation keeps only
    ``nu`` and is bit-exact vs optax (pinned by test_optim_b1zero); built
    from optax's own moment/bias-correction primitives so the arithmetic
    matches term-for-term.
    """

    def init_fn(params):
        return ScaleByAdamB1ZeroState(
            count=jnp.zeros([], jnp.int32),
            nu=optax.tree.zeros_like(params))

    def update_fn(updates, state, params=None):
        del params
        nu = optax.tree.update_moment_per_elem_norm(updates, state.nu, b2, 2)
        count_inc = optax.safe_increment(state.count)
        nu_hat = optax.tree.bias_correction(nu, b2, count_inc)
        new_updates = jax.tree.map(
            lambda g, v: None if g is None
            else g / (jnp.sqrt(v + eps_root) + eps),
            updates, nu_hat, is_leaf=lambda x: x is None)
        return new_updates, ScaleByAdamB1ZeroState(count=count_inc, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw(learning_rate: ScalarOrSchedule, betas, eps: float,
           weight_decay: float, mask: Optional[Callable] = None
           ) -> optax.GradientTransformation:
    b1, b2 = float(betas[0]), float(betas[1])
    # escape hatch (e.g. to restore a checkpoint whose optimizer state was
    # saved with the mu-carrying layout): VQVAE_TPU_ADAM_B1ZERO=0
    if b1 == 0.0 and os.environ.get("VQVAE_TPU_ADAM_B1ZERO", "1") == "1":
        return optax.chain(
            scale_by_adam_b1zero(b2=b2, eps=float(eps)),
            optax.add_decayed_weights(float(weight_decay), mask),
            optax.scale_by_learning_rate(learning_rate),
        )
    return optax.adamw(
        learning_rate=learning_rate, b1=b1, b2=b2, eps=float(eps),
        weight_decay=float(weight_decay), mask=mask,
    )


def make_ae_optimizer(learning_rate: ScalarOrSchedule, betas, eps: float,
                      weight_decay: float) -> optax.GradientTransformation:
    return _adamw(learning_rate, betas, eps, weight_decay, mask=decay_mask)


def make_disc_optimizer(learning_rate: ScalarOrSchedule, betas, eps: float,
                        weight_decay: float) -> optax.GradientTransformation:
    return _adamw(learning_rate, betas, eps, weight_decay)
