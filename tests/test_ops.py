"""Parity of the TPU ops layer (upfirdn2d / bias_act / conv2d_resample / VQ
kernel) against the reference implementations.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.ops.bias_act import bias_act
from vqvae_tpu.ops.conv2d_resample import conv2d_resample
from vqvae_tpu.ops.upfirdn2d import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
from vqvae_tpu.ops.vq import _nearest_codes_xla, nearest_codes
from vqvae_tpu.ops.vq_pallas import nearest_codes_pallas


@pytest.fixture(scope="module")
def torch_ops(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules.loss.stylegan2_discriminator.utils.ops import (  # noqa
        bias_act as ref_bias_act,
        upfirdn2d as ref_upfirdn2d,
    )
    return torch, ref_bias_act, ref_upfirdn2d


def _img(seed=0, b=2, c=3, h=8, w=8):
    return np.random.RandomState(seed).randn(b, c, h, w).astype(np.float32)


F1331 = setup_filter([1, 3, 3, 1])


@pytest.mark.parametrize("up,down,padding,flip", [
    (1, 1, 0, False),
    (1, 1, 2, False),
    (1, 2, 1, False),
    (2, 1, 1, False),
    (1, 2, [2, 1, 2, 1], False),
    (1, 1, 1, True),
    (2, 2, 1, False),
    (1, 1, [-1, 1, 0, 2], False),
])
def test_upfirdn2d_parity(torch_ops, up, down, padding, flip):
    torch, _, ref_up = torch_ops
    x = _img()
    f_t = torch.from_numpy(np.asarray(F1331))
    y_t = ref_up._upfirdn2d_ref(torch.from_numpy(x), f_t, up=up, down=down,
                                padding=padding, flip_filter=flip,
                                gain=1.5).numpy()
    y_j = upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)), F1331, up=up,
                    down=down, padding=padding, flip_filter=flip, gain=1.5)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)


def test_upfirdn2d_separable_matches_2d():
    x = jnp.asarray(_img(1).transpose(0, 2, 3, 1))
    f1 = setup_filter([1, 3, 3, 1], separable=True)
    f2 = setup_filter([1, 3, 3, 1], separable=False)
    assert f1.ndim == 1 and f2.ndim == 2
    y1 = upfirdn2d(x, f1, down=2, padding=1)
    y2 = upfirdn2d(x, f2, down=2, padding=1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)


def test_updown_helpers_parity(torch_ops):
    torch, _, ref_up = torch_ops
    x = _img(2)
    f_t = torch.from_numpy(np.asarray(F1331))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))

    y_t = ref_up.downsample2d(torch.from_numpy(x), f_t, impl="ref").numpy()
    y_j = downsample2d(xj, F1331)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)

    y_t = ref_up.upsample2d(torch.from_numpy(x), f_t, impl="ref").numpy()
    y_j = upsample2d(xj, F1331)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)

    y_t = ref_up.filter2d(torch.from_numpy(x), f_t, impl="ref").numpy()
    y_j = filter2d(xj, F1331)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)


def test_upfirdn2d_second_order_grad():
    """The R1 path differentiates twice through the FIR resample."""
    x = jnp.asarray(_img(3, b=1).transpose(0, 2, 3, 1))

    def f(z):
        return jnp.sum(downsample2d(z, F1331) ** 2)

    g = jax.grad(f)(x)

    def gsum(z):
        return jnp.sum(jax.grad(f)(z) ** 2)

    gg = jax.grad(gsum)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(gg)).all()


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
def test_bias_act_parity(torch_ops, act):
    torch, ref_ba, _ = torch_ops
    x = _img(4, b=2, c=4, h=4, w=4)
    b = np.random.RandomState(5).randn(4).astype(np.float32)
    y_t = ref_ba.bias_act(torch.from_numpy(x), torch.from_numpy(b), act=act,
                          gain=1.3, clamp=2.0, impl="ref").numpy()
    y_j = bias_act(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(b),
                   act=act, gain=1.3, clamp=2.0)
    # atol 2e-4: jax.nn.softplus/elu use different (equally valid) fp32
    # formulations than torch
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-3, atol=2e-4)


def test_conv2d_resample_down2_matches_composition(torch_ops):
    """conv2d_resample(down=2, 3x3) == reference fast path: upfirdn pad+filter
    then stride-2 conv (reference conv2d_resample.py:121-125)."""
    torch, _, ref_up = torch_ops
    sys.path.insert(0, "/root/reference")
    from vqvae.modules.loss.stylegan2_discriminator.utils.ops import (
        conv2d_resample as ref_cr)

    x = _img(6, b=2, c=4, h=8, w=8)
    w = np.random.RandomState(7).randn(5, 4, 3, 3).astype(np.float32) * 0.2
    f_t = torch.from_numpy(np.asarray(F1331))

    y_t = ref_cr.conv2d_resample(torch.from_numpy(x), torch.from_numpy(w),
                                 f=f_t, down=2, padding=1,
                                 flip_weight=True).detach().numpy()
    y_j = conv2d_resample(jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(w.transpose(2, 3, 1, 0)), f=F1331,
                          down=2, padding=1, flip_weight=True)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-4)


def test_conv2d_resample_1x1_skip_parity(torch_ops):
    torch, _, _ = torch_ops
    from vqvae.modules.loss.stylegan2_discriminator.utils.ops import (
        conv2d_resample as ref_cr)

    x = _img(8, b=2, c=4, h=8, w=8)
    w = np.random.RandomState(9).randn(6, 4, 1, 1).astype(np.float32) * 0.5
    f_t = torch.from_numpy(np.asarray(F1331))
    y_t = ref_cr.conv2d_resample(torch.from_numpy(x), torch.from_numpy(w),
                                 f=f_t, down=2, padding=0,
                                 flip_weight=True).detach().numpy()
    y_j = conv2d_resample(jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(w.transpose(2, 3, 1, 0)), f=F1331,
                          down=2, padding=0, flip_weight=True)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-4)


def test_nearest_codes_matches_bruteforce():
    rs = np.random.RandomState(10)
    x = rs.randn(64, 16).astype(np.float32)
    cb = rs.randn(32, 16).astype(np.float32)
    d = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    expected = d.argmin(1)
    got = _nearest_codes_xla(jnp.asarray(x), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_nearest_codes_pallas_interpret():
    rs = np.random.RandomState(11)
    x = rs.randn(512, 128).astype(np.float32)
    cb = rs.randn(128, 128).astype(np.float32)
    expected = _nearest_codes_xla(jnp.asarray(x), jnp.asarray(cb))
    got = nearest_codes_pallas(jnp.asarray(x), jnp.asarray(cb), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_nearest_codes_stats_pallas_interpret():
    from vqvae_tpu.ops.vq import _nearest_codes_stats_xla
    from vqvae_tpu.ops.vq_pallas import nearest_codes_stats_pallas

    rs = np.random.RandomState(12)
    x = rs.randn(512, 128).astype(np.float32)
    cb = rs.randn(128, 128).astype(np.float32)
    codes_e, counts_e, dw_e = _nearest_codes_stats_xla(
        jnp.asarray(x), jnp.asarray(cb))
    codes, counts, dw = nearest_codes_stats_pallas(
        jnp.asarray(x), jnp.asarray(cb), interpret=True)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes_e))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts_e))
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_e),
                               rtol=1e-5, atol=1e-5)
    # invariants: every latent counted once; dw row-sums match x mass
    assert float(counts.sum()) == x.shape[0]
    np.testing.assert_allclose(np.asarray(dw).sum(0), x.sum(0), rtol=1e-4)


def test_nearest_codes_stats_dispatcher_oracle():
    """On CPU the dispatcher must fall back to the XLA oracle."""
    from vqvae_tpu.ops.vq import _nearest_codes_stats_xla, nearest_codes_stats

    rs = np.random.RandomState(13)
    x = rs.randn(64, 16).astype(np.float32)
    cb = rs.randn(32, 16).astype(np.float32)
    got = nearest_codes_stats(jnp.asarray(x), jnp.asarray(cb))
    exp = _nearest_codes_stats_xla(jnp.asarray(x), jnp.asarray(cb))
    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), rtol=1e-6)


def test_vq_forced_impl_override(monkeypatch):
    """ops.vq.forced_impl beats the env var; explicit impl= still wins."""
    import numpy as np

    from vqvae_tpu.ops import vq

    x = jnp.asarray(np.random.RandomState(0).randn(8, 4).astype(np.float32))
    cb = jnp.asarray(np.random.RandomState(1).randn(5, 4).astype(np.float32))

    monkeypatch.setenv("VQVAE_TPU_VQ_IMPL", "pallas")
    with vq.forced_impl("xla"):
        # env says pallas (which would raise on CPU via nearest_codes_stats's
        # strict path); the override routes to the XLA oracle
        codes, counts, dw = vq.nearest_codes_stats(x, cb)
    assert codes.shape == (8,)
    # nesting restores the previous override on exit
    assert vq._dispatch_impl(None) == "pallas"
