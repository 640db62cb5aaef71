"""W-polyphase stage-1 LPIPS (VGG) vs the canonical formulation.

The poly path (models/lpips.py: _poly_kernel_stem/_poly_kernel_3x3/
_normalize_core_grouped/_max_pool_2x2_poly) recasts the C=64 stage-1 tensors
as dense [B, H, W/2, 128] — exactly the same math through rearranged conv
kernels, a per-group channel norm, and a phase-max pool. Forward values,
y-gradients, and the param tree must be identical to the canonical path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.lpips import LPIPS, init_lpips

B, IMG = 2, 32


@pytest.fixture(scope="module")
def setup():
    module, params = init_lpips("vgg", IMG, seed=3)
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
    y = np.clip(x + rs.uniform(-0.4, 0.4, x.shape), -1, 1).astype(np.float32)
    return params, jnp.asarray(x), jnp.asarray(y)


def _value_and_grad(params, x, y, dtype, poly, monkeypatch):
    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "1" if poly else "0")
    module = LPIPS(net_type="vgg", dtype=dtype)

    def loss(yy):
        return module.apply({"params": params}, x, yy)

    v, g = jax.value_and_grad(loss)(y)
    return float(v), np.asarray(g)


def test_poly_forward_and_grad_fp32(setup, monkeypatch):
    params, x, y = setup
    v0, g0 = _value_and_grad(params, x, y, jnp.float32, False, monkeypatch)
    v1, g1 = _value_and_grad(params, x, y, jnp.float32, True, monkeypatch)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = np.abs(g0).max()
    assert scale > 0
    np.testing.assert_allclose(g1, g0, rtol=1e-4, atol=1e-5 * scale)


def test_poly_forward_and_grad_bf16(setup, monkeypatch):
    params, x, y = setup
    v0, g0 = _value_and_grad(params, x, y, jnp.bfloat16, False, monkeypatch)
    v1, g1 = _value_and_grad(params, x, y, jnp.bfloat16, True, monkeypatch)
    # bf16 compute reorders sums (and a 1-ulp conv difference can flip a
    # pool-max winner, rerouting single pixels' gradients); fp32 parity above
    # is the exactness check — here assert aggregate agreement
    np.testing.assert_allclose(v1, v0, rtol=2e-2)
    g0f, g1f = g0.astype(np.float32), g1.astype(np.float32)
    scale = np.abs(g0f).max()
    np.testing.assert_allclose(g1f, g0f, atol=2e-1 * scale)
    assert np.abs(g1f - g0f).mean() < 2e-2 * scale


def test_poly_per_sample_distances(setup, monkeypatch):
    params, x, y = setup
    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "0")
    d0 = np.asarray(LPIPS(net_type="vgg", dtype=jnp.float32).apply(
        {"params": params}, x, y, reduce=False))
    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "1")
    d1 = np.asarray(LPIPS(net_type="vgg", dtype=jnp.float32).apply(
        {"params": params}, x, y, reduce=False))
    np.testing.assert_allclose(d1, d0, rtol=1e-5)


def test_poly_param_tree_identical(monkeypatch):
    """The poly path declares conv0/conv1 via _ConvParams — the param paths,
    shapes, and dtypes must match nn.Conv's exactly (checkpoint stability)."""
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)

    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "0")
    p0 = LPIPS(net_type="vgg", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x, x)["params"]
    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "1")
    p1 = LPIPS(net_type="vgg", dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x, x)["params"]

    s0 = jax.tree.map(lambda a: (a.shape, a.dtype), p0)
    s1 = jax.tree.map(lambda a: (a.shape, a.dtype), p1)
    assert jax.tree_util.tree_structure(s0) == jax.tree_util.tree_structure(s1)
    assert jax.tree.leaves(s0) == jax.tree.leaves(s1)
    # same seed -> identical values too (same initializers per path)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_poly_falls_back_on_odd_width(setup, monkeypatch):
    params, _, _ = setup
    monkeypatch.setenv("VQVAE_TPU_LPIPS_POLY", "1")
    # odd input width cannot polyphase; the module must fall back (dense)
    # rather than crash. 31x31 still pools unevenly in VGG, so just check
    # the resolver directly plus a 2-even-stage run.
    from vqvae_tpu.models.lpips import lpips_poly_default
    assert not lpips_poly_default(jnp.bfloat16, 31)
    assert lpips_poly_default(jnp.bfloat16, 32)
    assert not lpips_poly_default(jnp.bfloat16, 32, net_type="alex")
