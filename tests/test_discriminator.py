"""StyleGAN2 discriminator: numerical parity against the reference NVIDIA
implementation (weight copy, ref CUDA ops fall back to their torch reference
impls on CPU) + structural checks.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.discriminator import (
    Discriminator,
    FullyConnectedLayer,
    minibatch_std,
)
from vqvae_tpu.utils.torch_convert import convert_discriminator_state_dict

RES = 16


@pytest.fixture(scope="module")
def torch_disc(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules.loss.stylegan2_discriminator.discriminator import (  # noqa
        Discriminator as RefDiscriminator)
    return torch, RefDiscriminator


def test_discriminator_parity(torch_disc):
    torch, RefDiscriminator = torch_disc
    torch.manual_seed(0)
    d_t = RefDiscriminator(RES).eval()
    x = np.random.RandomState(0).randn(4, 3, RES, RES).astype(np.float32)
    with torch.no_grad():
        y_t = d_t(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in d_t.state_dict().items()}
    params = convert_discriminator_state_dict(sd, RES)
    d_j = Discriminator(img_resolution=RES)
    y_j = d_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert y_j.shape == (4, 1)
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=5e-3, atol=5e-4)


def test_discriminator_param_count(torch_disc):
    torch, RefDiscriminator = torch_disc
    for res in (16, 256):
        d_t = RefDiscriminator(res)
        n_torch = sum(p.numel() for p in d_t.parameters())
        d_j = Discriminator(img_resolution=res)
        if res <= 32:  # init is slow at 256 on 1-core CPU; count via eval_shape
            variables = d_j.init(jax.random.PRNGKey(0),
                                 jnp.zeros((4, res, res, 3)))
        else:
            variables = jax.eval_shape(
                lambda k: d_j.init(k, jnp.zeros((4, res, res, 3))),
                jax.random.PRNGKey(0))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
        assert n == n_torch, (res, n, n_torch)


def test_reference_71M_total(torch_disc):
    """BASELINE.md 'trainable params 71.1M' = encoder+decoder+codebook+disc."""
    torch, RefDiscriminator = torch_disc
    sys.path.insert(0, "/root/reference")
    from vqvae.modules import autoencoder as ref_ae
    n = sum(p.numel() for p in ref_ae.Encoder(128, 2, (1, 2, 2, 4), 256).parameters())
    n += sum(p.numel() for p in ref_ae.Decoder(128, 2, (1, 2, 2, 4), 256).parameters())
    n += 1024 * 256
    n += sum(p.numel() for p in RefDiscriminator(256).parameters())
    assert abs(n - 71.1e6) / 71.1e6 < 0.01


def test_minibatch_std_group4():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 4, 4, 6).astype(np.float32))
    y = minibatch_std(x, group_size=4)
    assert y.shape == (8, 4, 4, 7)
    # stddev channel constant within each (strided) group: sample b is grouped
    # with b +- k*(N/G), i.e. groups {0,2,4,6} and {1,3,5,7} here
    std_ch = np.asarray(y[..., -1])
    for i in range(2):
        grp = std_ch[i::2]
        assert np.allclose(grp, grp[0])
    assert not np.allclose(std_ch[0], std_ch[1])


def test_minibatch_std_parity(torch_disc):
    torch, _ = torch_disc
    from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
        MinibatchStdLayer)
    x = np.random.RandomState(2).randn(8, 6, 4, 4).astype(np.float32)
    y_t = MinibatchStdLayer(group_size=4)(torch.from_numpy(x)).numpy()
    y_j = minibatch_std(jnp.asarray(x.transpose(0, 2, 3, 1)), group_size=4)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)


def test_fully_connected_lr_multiplier():
    fc = FullyConnectedLayer(4, lr_multiplier=0.5, bias_init=1.0)
    x = jnp.ones((2, 8))
    params = fc.init(jax.random.PRNGKey(0), x)["params"]
    assert params["weight"].shape == (8, 4)
    y = fc.apply({"params": params}, x)
    assert y.shape == (2, 4)
