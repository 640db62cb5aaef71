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

from typing import Callable, Union

import jax
import optax

ScalarOrSchedule = Union[float, Callable]


def decay_mask(params) -> dict:
    """True where weight decay applies: conv kernels only (4-D params)."""
    return jax.tree.map(lambda p: p.ndim == 4, params)


def make_ae_optimizer(learning_rate: ScalarOrSchedule, betas, eps: float,
                      weight_decay: float) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=learning_rate,
        b1=float(betas[0]), b2=float(betas[1]), eps=float(eps),
        weight_decay=float(weight_decay),
        mask=decay_mask,
    )


def make_disc_optimizer(learning_rate: ScalarOrSchedule, betas, eps: float,
                        weight_decay: float) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=learning_rate,
        b1=float(betas[0]), b2=float(betas[1]), eps=float(eps),
        weight_decay=float(weight_decay),
    )
