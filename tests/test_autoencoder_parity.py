"""Numerical parity of the flax encoder/decoder against the reference torch
modules: copy weights torch -> flax and compare forward outputs.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from vqvae_tpu.models.autoencoder import Decoder, Encoder, GroupNorm
from vqvae_tpu.utils.torch_convert import convert_decoder, convert_encoder

CH, NRB, MULT, EDIM, IMG = 32, 1, (1, 2), 16, 16


@pytest.fixture(scope="module")
def torch_ref(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules import autoencoder as ref_ae  # noqa
    return torch, ref_ae


def _state_dict_np(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def test_groupnorm_parity(torch_ref):
    torch, ref_ae = torch_ref
    torch.manual_seed(0)
    gn_t = ref_ae.GroupNorm(num_groups=4, num_channels=CH)
    with torch.no_grad():
        gn_t.weight.uniform_(0.5, 1.5)
        gn_t.bias.uniform_(-0.5, 0.5)

    x = np.random.RandomState(1).randn(2, CH, 8, 8).astype(np.float32)
    y_t = gn_t(torch.from_numpy(x)).detach().numpy()

    gn_j = GroupNorm(num_groups=4)
    params = {"scale": gn_t.weight.detach().numpy().reshape(-1),
              "bias": gn_t.bias.detach().numpy().reshape(-1)}
    y_j = gn_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-5)


def test_encoder_parity(torch_ref):
    torch, ref_ae = torch_ref
    torch.manual_seed(0)
    enc_t = ref_ae.Encoder(CH, NRB, MULT, EDIM).eval()

    x = np.random.RandomState(2).randn(2, 3, IMG, IMG).astype(np.float32) * 0.5
    with torch.no_grad():
        y_t = enc_t(torch.from_numpy(x)).numpy()

    sd = _state_dict_np(enc_t, "encoder")
    params = convert_encoder(sd, NRB, len(MULT))
    enc_j = Encoder(channels=CH, num_res_blocks=NRB, channel_multipliers=MULT,
                    embedding_dim=EDIM)
    y_j = enc_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert y_j.shape == (2, IMG // 4, IMG // 4, EDIM)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-3, atol=1e-4)


def test_decoder_parity(torch_ref):
    torch, ref_ae = torch_ref
    torch.manual_seed(0)
    dec_t = ref_ae.Decoder(CH, NRB, MULT, EDIM).eval()

    z = np.random.RandomState(3).randn(2, EDIM, 4, 4).astype(np.float32)
    with torch.no_grad():
        y_t = dec_t(torch.from_numpy(z)).numpy()

    sd = _state_dict_np(dec_t, "decoder")
    params = convert_decoder(sd, NRB, len(MULT))
    dec_j = Decoder(channels=CH, num_res_blocks=NRB, channel_multipliers=MULT,
                    embedding_dim=EDIM)
    y_j = dec_j.apply({"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)))
    assert y_j.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-3, atol=1e-4)


def test_param_count_matches_torch_reference(torch_ref):
    """Flax encoder/decoder at full reference size (channels=128, 2 res
    blocks, multipliers 1-2-2-4, embedding 256) has exactly the torch
    reference's parameter count. (The readme's 71.1M also includes the
    28.9M-param StyleGAN2 discriminator, checked in test_discriminator.py.)"""
    import jax
    torch, ref_ae = torch_ref
    enc_t = ref_ae.Encoder(128, 2, (1, 2, 2, 4), 256)
    dec_t = ref_ae.Decoder(128, 2, (1, 2, 2, 4), 256)
    n_torch = sum(p.numel() for p in enc_t.parameters()) + \
        sum(p.numel() for p in dec_t.parameters())

    enc = Encoder(channels=128, num_res_blocks=2,
                  channel_multipliers=(1, 2, 2, 4), embedding_dim=256)
    dec = Decoder(channels=128, num_res_blocks=2,
                  channel_multipliers=(1, 2, 2, 4), embedding_dim=256)
    ep = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    dp = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 256)))
    n = sum(p.size for p in jax.tree.leaves(ep)) + \
        sum(p.size for p in jax.tree.leaves(dp))
    assert n == n_torch
