"""Rematerialization: remat=True must not change forward values or gradients
(it only changes the backward-pass memory/FLOP tradeoff)."""

import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.models.autoencoder import Decoder, Encoder
from vqvae_tpu.models.discriminator import Discriminator


def test_encoder_remat_equivalence():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3)
                    .astype(np.float32))
    kwargs = dict(channels=32, num_res_blocks=1, channel_multipliers=(1, 2),
                  embedding_dim=8)
    enc = Encoder(**kwargs, remat=False)
    enc_r = Encoder(**kwargs, remat=True)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    y = enc.apply({"params": params}, x)
    y_r = enc_r.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), atol=1e-6)

    def loss(p, module):
        return jnp.sum(module.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params, enc)
    g_r = jax.grad(loss)(params, enc_r)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_discriminator_remat_equivalence():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 16, 16, 3)
                    .astype(np.float32))
    d = Discriminator(img_resolution=16, remat=False)
    d_r = Discriminator(img_resolution=16, remat=True)
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    y = d.apply({"params": params}, x)
    y_r = d_r.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                               rtol=1e-5, atol=1e-6)
