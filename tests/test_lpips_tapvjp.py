"""Fused tap-score VJP (VQVAE_TPU_LPIPS_TAPVJP) vs the autodiff form.

``_tap_score`` replaces the per-layer ``mean(einsum((fx-fy)**2, lin))`` with
a custom_vjp whose only full-resolution residual is the tap DIFFERENCE —
halving the large-tensor reads of the LPIPS backward (PERFORMANCE.md). The
primal is the same expression, so forward values must be bit-identical;
input gradients must agree to dtype precision; lin-head gradients (frozen in
training but differentiable in principle) must match too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.lpips import LPIPS, _tap_score, init_lpips

B, IMG = 2, 32


@pytest.fixture(scope="module")
def setup():
    _, params = init_lpips("vgg", IMG, seed=3)
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
    y = np.clip(x + rs.uniform(-0.4, 0.4, x.shape), -1, 1).astype(np.float32)
    return params, jnp.asarray(x), jnp.asarray(y)


def _value_and_grad(params, x, y, dtype, tapvjp, monkeypatch, net="vgg"):
    monkeypatch.setenv("VQVAE_TPU_LPIPS_TAPVJP", "1" if tapvjp else "0")
    module = LPIPS(net_type=net, dtype=dtype)

    def loss(yy):
        return module.apply({"params": params}, x, yy)

    v, g = jax.value_and_grad(loss)(y)
    return float(v), np.asarray(g)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tapvjp_forward_bit_identical(setup, monkeypatch, dtype):
    params, x, y = setup
    module = LPIPS(net_type="vgg", dtype=dtype)
    monkeypatch.setenv("VQVAE_TPU_LPIPS_TAPVJP", "0")
    v0 = module.apply({"params": params}, x, y, reduce=False)
    monkeypatch.setenv("VQVAE_TPU_LPIPS_TAPVJP", "1")
    v1 = module.apply({"params": params}, x, y, reduce=False)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))


def test_tapvjp_grad_fp32(setup, monkeypatch):
    params, x, y = setup
    v0, g0 = _value_and_grad(params, x, y, jnp.float32, False, monkeypatch)
    v1, g1 = _value_and_grad(params, x, y, jnp.float32, True, monkeypatch)
    assert v1 == v0
    scale = np.abs(g0).max()
    assert scale > 0
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6 * scale)


def test_tapvjp_grad_bf16(setup, monkeypatch):
    params, x, y = setup
    v0, g0 = _value_and_grad(params, x, y, jnp.bfloat16, False, monkeypatch)
    v1, g1 = _value_and_grad(params, x, y, jnp.bfloat16, True, monkeypatch)
    assert v1 == v0  # primal path identical regardless of compute dtype
    g0f, g1f = g0.astype(np.float32), g1.astype(np.float32)
    scale = np.abs(g0f).max()
    # the custom bwd multiplies (d * lin * ct) in fp32 where autodiff chains
    # bf16 casts — per-element bf16-rounding differences only
    np.testing.assert_allclose(g1f, g0f, atol=2e-2 * scale)
    assert np.abs(g1f - g0f).mean() < 2e-3 * scale


def test_tapvjp_alex_backbone(setup, monkeypatch):
    """The toggle is backbone-agnostic (it lives in the score loop)."""
    _, params = init_lpips("alex", IMG, seed=3)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32))
    y = jnp.asarray(
        np.clip(np.asarray(x) + rs.uniform(-0.3, 0.3, x.shape), -1, 1)
        .astype(np.float32))
    v0, g0 = _value_and_grad(params, x, y, jnp.float32, False, monkeypatch,
                             net="alex")
    v1, g1 = _value_and_grad(params, x, y, jnp.float32, True, monkeypatch,
                             net="alex")
    assert v1 == v0
    scale = np.abs(g0).max()
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6 * scale)


def test_tap_score_lin_grad_matches_autodiff():
    """d(score)/d(lin) from the custom bwd == autodiff of the primal
    expression (exercised directly: the module path never differentiates
    the frozen heads)."""
    rs = np.random.RandomState(3)
    fx = jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32))
    fy = jnp.asarray(rs.randn(2, 4, 4, 8).astype(np.float32))
    lin = jnp.asarray(rs.rand(8, 1).astype(np.float32))

    def ref(l):
        w = jnp.einsum("bhwc,co->bhwo", (fx - fy) ** 2, l,
                       preferred_element_type=jnp.float32)
        return jnp.sum(jnp.mean(w, axis=(1, 2, 3)))

    g_ref = jax.grad(ref)(lin)
    g_tap = jax.grad(lambda l: jnp.sum(_tap_score(fx, fy, l)))(lin)
    np.testing.assert_allclose(np.asarray(g_tap), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)
