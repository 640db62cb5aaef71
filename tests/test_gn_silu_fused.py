"""Fused GroupNorm+SiLU custom VJP (autoencoder.GNSiLU) vs the autodiff
composition: forward bit-identical (shared helper), gradients allclose in
fp32 for x / scale / bias — pins the hand-written unbiased-variance GN
backward and the recomputed silu' path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.autoencoder import GNSiLU, GroupNorm, _gn_silu_core

B, H, W, C, G = 2, 8, 8, 32, 32 // 8  # num_groups must divide C


def _inputs(seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, H, W, C).astype(np.float32)
    scale = rs.uniform(0.5, 1.5, (C,)).astype(np.float32)
    bias = rs.uniform(-0.5, 0.5, (C,)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)


def _plain(x, scale, bias):
    gn = GroupNorm(num_groups=G)
    y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    return jax.nn.silu(y)


def test_forward_bit_identical():
    x, scale, bias = _inputs()
    out_fused = _gn_silu_core(x, scale, bias, G, 1e-6, jnp.dtype(jnp.float32))
    out_plain = _plain(x, scale, bias)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_plain))


def test_gradients_match_autodiff_fp32():
    x, scale, bias = _inputs(1)
    ct = jnp.asarray(np.random.RandomState(2).randn(B, H, W, C)
                     .astype(np.float32))

    def f_fused(x, s, b):
        return jnp.sum(_gn_silu_core(x, s, b, G, 1e-6,
                                     jnp.dtype(jnp.float32)) * ct)

    def f_plain(x, s, b):
        return jnp.sum(_plain(x, s, b) * ct)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_plain = jax.grad(f_plain, argnums=(0, 1, 2))(x, scale, bias)
    for gf, gp, name in zip(g_fused, g_plain, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   rtol=2e-5, atol=1e-6, err_msg=name)


def test_module_env_fallback_and_param_paths(monkeypatch):
    """GNSiLU params live at the same paths as GroupNorm (checkpoint
    compatibility), and VQVAE_TPU_GN_FUSED=0 selects the plain composition
    with identical output."""
    x, scale, bias = _inputs(3)
    variables = {"params": {"scale": scale, "bias": bias}}

    mod = GNSiLU(num_groups=G)
    init_params = mod.init(jax.random.PRNGKey(0), x)["params"]
    assert set(init_params.keys()) == {"scale", "bias"}

    monkeypatch.setenv("VQVAE_TPU_GN_FUSED", "1")
    out_fused = mod.apply(variables, x)
    monkeypatch.setenv("VQVAE_TPU_GN_FUSED", "0")
    out_plain = GNSiLU(num_groups=G).apply(variables, x)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_plain))


def test_bf16_compute_dtype():
    """Production policy: bf16 out_dtype, fp32 stats; grads finite and close
    to the plain path."""
    x, scale, bias = _inputs(4)
    xb = x.astype(jnp.bfloat16)

    def f_fused(xx):
        return jnp.sum(_gn_silu_core(xx, scale, bias, G, 1e-6,
                                     jnp.dtype(jnp.bfloat16))
                       .astype(jnp.float32))

    def f_plain(xx):
        gn = GroupNorm(num_groups=G, dtype=jnp.bfloat16)
        y = gn.apply({"params": {"scale": scale, "bias": bias}}, xx)
        return jnp.sum(jax.nn.silu(y).astype(jnp.float32))

    g_fused = np.asarray(jax.grad(f_fused)(xb), np.float32)
    g_plain = np.asarray(jax.grad(f_plain)(xb), np.float32)
    assert np.isfinite(g_fused).all()
    cos = (g_fused * g_plain).sum() / (
        np.linalg.norm(g_fused) * np.linalg.norm(g_plain) + 1e-30)
    assert cos > 0.999, cos
