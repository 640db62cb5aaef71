"""Gradient-routing parity for the shared-D-forward train step.

The joint GAN loss uses ONE discriminator forward on the reconstructions,
shared between the generator loss and the discriminator loss via
``make_paired_logits`` (steps.py). These tests pin the routing semantics to
the reference's two-phase manual optimization (reference model.py:244-264,
loss.py:114-164):

- generator-loss cotangent reaches the input (reconstruction) ONLY,
- discriminator-loss cotangent reaches D's parameters ONLY,
- both exactly equal the naive two-forward stop_gradient formulation,
- the pairing is twice-differentiable (the R1 step's 2nd-order path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.models.discriminator import Discriminator
from vqvae_tpu.train.steps import make_paired_logits


@pytest.fixture(scope="module")
def disc_setup():
    disc = Discriminator(img_resolution=16, dtype=jnp.float32, remat=False)
    x = jnp.asarray(
        np.random.RandomState(0).rand(4, 16, 16, 3).astype(np.float32))
    dp = disc.init(jax.random.PRNGKey(1), x)["params"]
    return disc, dp, x


def _losses_shared(disc, dp, x):
    paired = make_paired_logits(lambda d, im: disc.apply({"params": d}, im))
    lg, ld = paired(dp, x)
    # arbitrary distinct nonlinear losses for the two routes
    return jnp.sum(jnp.tanh(lg)) + jnp.sum(ld ** 2)


def _losses_reference(disc, dp, x):
    lg = disc.apply({"params": jax.lax.stop_gradient(dp)}, x)
    ld = disc.apply({"params": dp}, jax.lax.stop_gradient(x))
    return jnp.sum(jnp.tanh(lg)) + jnp.sum(ld ** 2)


def test_paired_routing_matches_two_phase(disc_setup):
    disc, dp, x = disc_setup
    g_new = jax.grad(lambda d, im: _losses_shared(disc, d, im),
                     argnums=(0, 1))(dp, x)
    g_ref = jax.grad(lambda d, im: _losses_reference(disc, d, im),
                     argnums=(0, 1))(dp, x)
    for a, b in zip(jax.tree.leaves(g_new[0]), jax.tree.leaves(g_ref[0])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g_new[1], g_ref[1], rtol=1e-5, atol=1e-6)


def test_g_route_never_touches_disc_params(disc_setup):
    disc, dp, x = disc_setup
    paired = make_paired_logits(lambda d, im: disc.apply({"params": d}, im))

    def g_only(d, im):
        lg, _ = paired(d, im)
        return jnp.sum(jnp.tanh(lg))

    ddp = jax.grad(g_only)(dp, x)
    assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in jax.tree.leaves(ddp))


def test_d_route_never_touches_input(disc_setup):
    disc, dp, x = disc_setup
    paired = make_paired_logits(lambda d, im: disc.apply({"params": d}, im))

    def d_only(d, im):
        _, ld = paired(d, im)
        return jnp.sum(ld ** 2)

    dx = jax.grad(d_only, argnums=1)(dp, x)
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_paired_is_twice_differentiable(disc_setup):
    disc, dp, x = disc_setup
    paired = make_paired_logits(lambda d, im: disc.apply({"params": d}, im))

    def r1_like(d, im):
        # grad-of-grad through the pairing, as the R1-staged step does
        def inner(im2):
            lg, _ = paired(d, im2)
            return jnp.sum(lg)

        g = jax.grad(inner)(im)
        return jnp.sum(g * g)

    out = jax.grad(r1_like, argnums=1)(dp, x)
    assert np.all(np.isfinite(np.asarray(out)))
