"""GAN + reconstruction loss primitives.

Parity with the reference loss stack (vqvae/modules/loss/loss.py:11-199),
as pure jnp functions; the epoch gating, adaptive generator weight and R1
cadence are composed in the jitted train step
(vqvae_tpu/train/steps.py), where JAX's native higher-order autodiff
replaces the reference's `conv2d_gradfix.no_weight_gradients` machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(recon, target):
    return jnp.mean(jnp.abs(target - recon))


def l2_loss(recon, target):
    return jnp.mean((target - recon) ** 2)


def generator_loss_per_sample(logits_fake: jnp.ndarray,
                              loss_type: str = "hinge"):
    """Per-sample generator adversarial loss, (B,)-shaped (used by the
    masked eval step; the scalar trainer loss is its batch mean)."""
    if loss_type == "hinge":
        per = -logits_fake
    elif loss_type == "non-saturating":
        # BCE-with-logits against ones == softplus(-logits)
        per = jax.nn.softplus(-logits_fake)
    else:
        raise ValueError(f"unknown loss_type: {loss_type}")
    return per.reshape(per.shape[0], -1).mean(axis=1)


def generator_loss(logits_fake: jnp.ndarray, loss_type: str = "hinge"):
    """Generator adversarial loss (reference loss.py:11-26)."""
    return jnp.mean(generator_loss_per_sample(logits_fake, loss_type))


def discriminator_loss_per_sample(logits_real: jnp.ndarray,
                                  logits_fake: jnp.ndarray,
                                  loss_type: str = "hinge"):
    """Per-sample discriminator adversarial loss, (B,)-shaped."""
    if loss_type == "hinge":
        real = jax.nn.relu(1.0 - logits_real)
        fake = jax.nn.relu(1.0 + logits_fake)
    elif loss_type == "non-saturating":
        real = jax.nn.softplus(-logits_real)   # BCE vs ones
        fake = jax.nn.softplus(logits_fake)    # BCE vs zeros
    else:
        raise ValueError(f"unknown loss_type: {loss_type}")
    per = real + fake
    return per.reshape(per.shape[0], -1).mean(axis=1)


def discriminator_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray,
                       loss_type: str = "hinge"):
    """Discriminator adversarial loss (reference loss.py:29-51)."""
    return jnp.mean(
        discriminator_loss_per_sample(logits_real, logits_fake, loss_type))


def r1_penalty(disc_apply, disc_params, images: jnp.ndarray,
               r1_cost: float) -> jnp.ndarray:
    """R1 gradient penalty: r1_cost * E_b[ sum_pixels |grad_x D(x)|^2 ]
    (reference loss.py:98-112). ``disc_apply(params, images)`` -> logits.

    Differentiating this penalty w.r.t. disc_params is a second-order
    gradient; JAX composes it natively (the reference needs a custom
    `no_weight_gradients` double-backward hack for cuDNN).
    """
    def total_logits(imgs):
        return jnp.sum(disc_apply(disc_params, imgs))

    grads = jax.grad(total_logits)(images)
    per_sample = jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1)
    return r1_cost * jnp.mean(per_sample)
