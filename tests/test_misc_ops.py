"""fma / grid_sample / modulated_conv2d parity with torch & reference."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.ops.misc_ops import fma, grid_sample, modulated_conv2d


def test_fma():
    rs = np.random.RandomState(0)
    a, b, c = [jnp.asarray(rs.randn(4, 4).astype(np.float32)) for _ in range(3)]
    np.testing.assert_allclose(np.asarray(fma(a, b, c)),
                               np.asarray(a) * np.asarray(b) + np.asarray(c))
    # differentiable
    g = jax.grad(lambda aa: jnp.sum(fma(aa, b, c)))(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(b))


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)
    x = rs.randn(2, 3, 8, 8).astype(np.float32)
    grid = (rs.rand(2, 5, 6, 2).astype(np.float32) * 2 - 1) * 0.9

    y_t = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=False).numpy()

    y_j = grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_second_order_grad():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 6, 6, 2).astype(np.float32))
    grid = jnp.asarray((rs.rand(1, 3, 3, 2).astype(np.float32) * 2 - 1) * 0.8)

    def f(g):
        return jnp.sum(grid_sample(x, g) ** 2)

    gg = jax.grad(lambda g: jnp.sum(jax.grad(f)(g) ** 2))(grid)
    assert np.isfinite(np.asarray(gg)).all()


def test_modulated_conv2d_parity(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
        modulated_conv2d as ref_mod)

    rs = np.random.RandomState(3)
    x = rs.randn(2, 4, 8, 8).astype(np.float32)
    w = rs.randn(6, 4, 3, 3).astype(np.float32) * 0.3
    styles = rs.rand(2, 4).astype(np.float32) + 0.5

    y_t = ref_mod(torch.from_numpy(x), torch.from_numpy(w),
                  torch.from_numpy(styles), padding=1,
                  demodulate=True).detach().numpy()
    y_j = modulated_conv2d(jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jnp.asarray(w.transpose(2, 3, 1, 0)),
                           jnp.asarray(styles), demodulate=True, padding=1)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=2e-3, atol=1e-4)
