"""_up_conv_folded (decoder upsample fold, models/autoencoder.py): the
hand-written reverse-free backward must match autodiff of the lhs-dilated
conv exactly — dx via the flipped stride-2 conv, dk4 via four per-parity
plain-conv pullbacks."""

import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.models.autoencoder import _up_conv_folded


def _ref(x, k4):
    return jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_up_conv_folded_fwd_and_grads_match_autodiff():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 6, 5).astype(np.float32))
    k4 = jnp.asarray(rs.randn(4, 4, 5, 7).astype(np.float32))

    def loss_ref(x, k4):
        return jnp.sum(jnp.sin(_ref(x, k4)))

    def loss_new(x, k4):
        return jnp.sum(jnp.sin(_up_conv_folded(x, k4, jnp.dtype(jnp.float32))))

    np.testing.assert_allclose(float(loss_new(x, k4)), float(loss_ref(x, k4)),
                               rtol=1e-6)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k4)
    g_new = jax.grad(loss_new, argnums=(0, 1))(x, k4)
    np.testing.assert_allclose(np.asarray(g_new[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=1e-4)


def test_up_conv_folded_bf16_grads_exact():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 4, 3).astype(np.float32))
    k4 = jnp.asarray(rs.randn(4, 4, 3, 3).astype(np.float32))

    def loss_ref(x, k4):
        return jnp.sum(_ref(x.astype(jnp.bfloat16),
                            k4.astype(jnp.bfloat16)).astype(jnp.float32))

    def loss_new(x, k4):
        return jnp.sum(
            _up_conv_folded(x, k4, jnp.dtype(jnp.bfloat16)).astype(jnp.float32))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k4)
    g_new = jax.grad(loss_new, argnums=(0, 1))(x, k4)
    # identical tap sums in both formulations -> bitwise-equal bf16 grads
    np.testing.assert_array_equal(np.asarray(g_new[0]), np.asarray(g_ref[0]))
    np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                               rtol=1e-6)
