"""LPIPS module + GAN loss primitive tests (pretrained weights not required:
architecture/maths invariants + torch-parity for the loss functions).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.losses.losses import (
    discriminator_loss,
    generator_loss,
    l1_loss,
    l2_loss,
    r1_penalty,
)
from vqvae_tpu.models.lpips import LPIPS, VGG16_CHANNELS, ALEX_CHANNELS


@pytest.mark.parametrize("net_type,channels", [("vgg", VGG16_CHANNELS),
                                               ("alex", ALEX_CHANNELS)])
def test_lpips_zero_on_identical(net_type, channels):
    size = 64 if net_type == "alex" else 32  # alex needs >= 63px (11/4 conv)
    m = LPIPS(net_type=net_type)
    x = jnp.asarray(np.random.RandomState(0).randn(2, size, size, 3)
                    .astype(np.float32) * 0.3)
    variables = m.init(jax.random.PRNGKey(0), x, x)
    d_same = m.apply(variables, x, x)
    assert float(d_same) == pytest.approx(0.0, abs=1e-6)

    y = x + 0.5
    d_diff = m.apply(variables, x, y)
    assert float(d_diff) > 0.0


def test_lpips_vgg_structure():
    m = LPIPS(net_type="vgg")
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init(jax.random.PRNGKey(0), x, x)
    params = variables["params"]
    # 13 VGG convs + 5 lin heads
    assert len(params["net"]) == 13
    for i, ch in enumerate(VGG16_CHANNELS):
        assert params[f"lin{i}"].shape == (ch, 1)


def test_gan_losses_parity_with_torch():
    """Replicates the reference formulas (loss.py:11-51) in torch directly —
    importing reference loss.py is impossible here (pulls torchvision)."""
    torch = pytest.importorskip("torch")
    F = torch.nn.functional

    logits_f = np.random.RandomState(0).randn(8, 1).astype(np.float32)
    logits_r = np.random.RandomState(1).randn(8, 1).astype(np.float32)
    tf, tr = torch.from_numpy(logits_f), torch.from_numpy(logits_r)

    # hinge (loss.py:16-17, 36-38)
    g_t = float(-torch.mean(tf))
    assert float(generator_loss(jnp.asarray(logits_f), "hinge")) == \
        pytest.approx(g_t, rel=1e-4)
    d_t = float(torch.mean(F.relu(1.0 - tr) + F.relu(1.0 + tf)))
    assert float(discriminator_loss(jnp.asarray(logits_r),
                                    jnp.asarray(logits_f), "hinge")) == \
        pytest.approx(d_t, rel=1e-4)

    # non-saturating (loss.py:19-23, 39-47)
    g_t = float(F.binary_cross_entropy_with_logits(tf, torch.ones_like(tf)))
    assert float(generator_loss(jnp.asarray(logits_f), "non-saturating")) == \
        pytest.approx(g_t, rel=1e-4)
    real = F.binary_cross_entropy_with_logits(tr, torch.ones_like(tr),
                                              reduction="none")
    fake = F.binary_cross_entropy_with_logits(tf, torch.zeros_like(tf),
                                              reduction="none")
    d_t = float(torch.mean(real + fake))
    assert float(discriminator_loss(jnp.asarray(logits_r),
                                    jnp.asarray(logits_f),
                                    "non-saturating")) == \
        pytest.approx(d_t, rel=1e-4)


def test_r1_penalty_quadratic():
    """For D(x) = sum(w * x), grad_x D = w; penalty = cost * |w|^2."""
    w = jnp.asarray(np.random.RandomState(2).randn(4, 4, 3).astype(np.float32))

    def apply_fn(params, imgs):
        return jnp.sum(imgs * params, axis=(1, 2, 3), keepdims=True)[:, :, 0, 0]

    images = jnp.ones((5, 4, 4, 3))
    r1 = r1_penalty(apply_fn, w, images, r1_cost=10.0)
    assert float(r1) == pytest.approx(10.0 * float(jnp.sum(w ** 2)), rel=1e-5)


def test_l1_l2():
    a = jnp.ones((2, 2)) * 2
    b = jnp.zeros((2, 2))
    assert float(l1_loss(a, b)) == pytest.approx(2.0)
    assert float(l2_loss(a, b)) == pytest.approx(4.0)


def test_per_sample_losses_mean_to_scalar():
    """The masked-eval per-sample helpers must average to the scalar
    training losses for every loss_type."""
    from vqvae_tpu.losses.losses import (
        discriminator_loss, discriminator_loss_per_sample,
        generator_loss, generator_loss_per_sample)

    rs = np.random.RandomState(0)
    lf = jnp.asarray(rs.randn(8, 1), jnp.float32)
    lr = jnp.asarray(rs.randn(8, 1), jnp.float32)
    for lt in ("hinge", "non-saturating"):
        g_per = generator_loss_per_sample(lf, lt)
        assert g_per.shape == (8,)
        np.testing.assert_allclose(float(jnp.mean(g_per)),
                                   float(generator_loss(lf, lt)), rtol=1e-6)
        d_per = discriminator_loss_per_sample(lr, lf, lt)
        assert d_per.shape == (8,)
        np.testing.assert_allclose(float(jnp.mean(d_per)),
                                   float(discriminator_loss(lr, lf, lt)),
                                   rtol=1e-6)
