"""End-to-end torch-checkpoint import: assemble a Lightning-style state_dict
from the reference torch modules, convert + save via save_eval_checkpoint,
restore through restore_for_eval, and check forward parity of the full
model — the offline equivalent of importing the released HF checkpoints
(tools/import_torch_checkpoint.py; reference evaluate.py:48-49).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import parse_config
from vqvae_tpu.models.vqvae import VQVAE, model_rngs
from vqvae_tpu.train.loop import Trainer
from vqvae_tpu.utils.checkpoint import restore_for_eval, save_eval_checkpoint
from vqvae_tpu.utils.torch_convert import convert_vqvae_state_dict

CH, NRB, MULT, EDIM, NCODES, IMG = 32, 1, (1, 2), 16, 32, 16


@pytest.fixture(scope="module")
def torch_ref(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules import autoencoder as ref_ae  # noqa
    from vqvae.modules import vector_quantizers as ref_vq  # noqa
    return torch, ref_ae, ref_vq


def _cfg():
    return parse_config({
        "image_size": IMG,
        "autoencoder": {"channels": CH, "num_res_blocks": NRB,
                        "channel_multipliers": list(MULT)},
        "quantizer": {"num_embeddings": NCODES, "embedding_dim": EDIM,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })


def test_torch_checkpoint_import_roundtrip(torch_ref, tmp_path):
    torch, ref_ae, ref_vq = torch_ref
    torch.manual_seed(0)

    # reference submodules wired exactly as VQVAE.__init__ names them
    # (reference model.py:126-149)
    enc = ref_ae.Encoder(CH, NRB, MULT, EDIM).eval()
    dec = ref_ae.Decoder(CH, NRB, MULT, EDIM).eval()
    quant = ref_vq.VectorQuantizer(NCODES, EDIM).eval()

    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec),
                        ("quantizer", quant)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    # a Lightning ckpt also carries loss-stack weights -> must be ignored
    sd["criterion.some_buffer"] = np.zeros((3,), np.float32)
    sd = {k: v for k, v in sd.items() if not k.startswith("criterion.")}

    variables = convert_vqvae_state_dict(sd, "standard", NRB, len(MULT))
    save_eval_checkpoint(str(tmp_path / "imported"), variables)

    cfg = _cfg()
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    state = restore_for_eval(str(tmp_path / "imported"), state)

    # forward parity on the full model: torch pipeline vs imported flax
    x = np.random.RandomState(3).rand(2, IMG, IMG, 3).astype(np.float32)
    xn = x * 2.0 - 1.0  # normalized (-1, 1)

    with torch.no_grad():
        z_t = enc(torch.from_numpy(xn.transpose(0, 3, 1, 2)))
        import einops
        zq_t, _, _ = quant(z_t)
        rec_t = dec(zq_t).numpy()

    model = VQVAE.from_config(cfg)
    rec_j, _, codes = model.apply(
        {"params": state.params}, jnp.asarray(xn), train=False)
    np.testing.assert_allclose(np.asarray(rec_j).transpose(0, 3, 1, 2),
                               rec_t, rtol=5e-4, atol=5e-4)
