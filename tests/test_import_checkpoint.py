"""End-to-end torch-checkpoint import: assemble a Lightning-style state_dict
from the reference torch modules, convert + save via save_eval_checkpoint,
restore through restore_for_eval, and check forward parity of the full
model — the offline equivalent of importing the released HF checkpoints
(tools/import_torch_checkpoint.py; reference evaluate.py:48-49).

Covers ALL FOUR quantizer families (standard/ema/entropy: full forward
parity; gumbel: noise-free sub-paths — logits conv + decode-from-tokens —
since the reference samples gumbel noise from the torch RNG even at eval,
vector_quantizers.py:230-233) and the flagship 256^2/72M-param shape via
eval_shape (no compute).
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

Q_PARAMS = {
    "standard": {"commitment_cost": 0.25},
    "ema": {"commitment_cost": 0.25, "decay": 0.95, "epsilon": 1e-5},
    "gumbel": {"straight_through": False, "temp": 1.0, "kl_cost": 0.01},
    "entropy": {"ent_loss_ratio": 0.1, "ent_temperature": 0.01,
                "ent_loss_type": "softmax", "commitment_cost": 0.25},
}


@pytest.fixture(scope="module")
def torch_ref(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules import autoencoder as ref_ae  # noqa
    from vqvae.modules import vector_quantizers as ref_vq  # noqa
    return torch, ref_ae, ref_vq


def _cfg(q_type="standard", img=IMG, ch=CH, nrb=NRB, mult=MULT, edim=EDIM,
         ncodes=NCODES):
    return parse_config({
        "image_size": img,
        "autoencoder": {"channels": ch, "num_res_blocks": nrb,
                        "channel_multipliers": list(mult)},
        "quantizer": {"num_embeddings": ncodes, "embedding_dim": edim,
                      "type": q_type, "reinit_every_n_epochs": None,
                      "params": Q_PARAMS[q_type]},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })


def _make_ref_quantizer(ref_vq, q_type, torch):
    if q_type == "standard":
        return ref_vq.VectorQuantizer(NCODES, EDIM)
    if q_type == "ema":
        q = ref_vq.EMAVectorQuantizer(NCODES, EDIM)
        # non-trivial EMA state so the vq_state import is actually exercised
        with torch.no_grad():
            q.ema_count.uniform_(0.5, 2.0)
            q.ema_weight.normal_(0.0, 0.05)
            q.codebook.weight.copy_(q.ema_weight / q.ema_count[:, None])
        return q
    if q_type == "gumbel":
        return ref_vq.GumbelVectorQuantizer(NCODES, EDIM)
    return ref_vq.EntropyVectorQuantizer(NCODES, EDIM)


def _lightning_sd(enc, dec, quant):
    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec),
                        ("quantizer", quant)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    # a Lightning ckpt also carries loss-stack weights -> must be ignored
    sd["criterion.some_buffer"] = np.zeros((3,), np.float32)
    return {k: v for k, v in sd.items() if not k.startswith("criterion.")}


@pytest.mark.parametrize("q_type", ["standard", "ema", "entropy", "gumbel"])
def test_torch_checkpoint_import_roundtrip(torch_ref, tmp_path, q_type):
    torch, ref_ae, ref_vq = torch_ref
    torch.manual_seed(0)

    # reference submodules wired exactly as VQVAE.__init__ names them
    # (reference model.py:126-149); gumbel encoder emits cb_size channels
    # (model.py:130)
    enc_out = NCODES if q_type == "gumbel" else EDIM
    enc = ref_ae.Encoder(CH, NRB, MULT, enc_out).eval()
    dec = ref_ae.Decoder(CH, NRB, MULT, EDIM).eval()
    quant = _make_ref_quantizer(ref_vq, q_type, torch).eval()

    sd = _lightning_sd(enc, dec, quant)
    variables = convert_vqvae_state_dict(sd, q_type, NRB, len(MULT))
    save_eval_checkpoint(str(tmp_path / "imported"), variables)

    cfg = _cfg(q_type)
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    state = restore_for_eval(str(tmp_path / "imported"), state)

    if q_type == "ema":
        # the EMA accumulators must import exactly (resume-grade vq_state)
        for key in ("codebook", "ema_count", "ema_weight"):
            np.testing.assert_array_equal(
                np.asarray(state.vq_state["quantizer"][key]),
                quant.state_dict()[key if key != "codebook"
                                   else "codebook.weight"].numpy(),
                err_msg=key)

    x = np.random.RandomState(3).rand(2, IMG, IMG, 3).astype(np.float32)
    xn = x * 2.0 - 1.0  # normalized (-1, 1)
    model = VQVAE.from_config(cfg)
    vars_j = {"params": state.params}
    if state.vq_state is not None:
        vars_j["vq_state"] = state.vq_state

    with torch.no_grad():
        z_t = enc(torch.from_numpy(xn.transpose(0, 3, 1, 2)))

    if q_type == "gumbel":
        # gumbel samples torch-RNG noise even at eval — compare the
        # deterministic sub-paths that cover every imported tensor instead:
        # (1) the x_to_logits 1x1 conv, (2) decode-from-tokens (codebook +
        # decoder)
        with torch.no_grad():
            logits_t = quant.x_to_logits(z_t).numpy()
        z_j = model.apply(vars_j, jnp.asarray(xn), method="encode")
        k = np.asarray(state.params["quantizer"]["x_to_logits_kernel"])[0, 0]
        b = np.asarray(state.params["quantizer"]["x_to_logits_bias"])
        logits_j = np.asarray(z_j) @ k + b
        np.testing.assert_allclose(logits_j.transpose(0, 3, 1, 2), logits_t,
                                   rtol=5e-4, atol=5e-4)

        codes = np.random.RandomState(0).randint(
            0, NCODES, (2, (IMG // 4) ** 2), np.int32)
        with torch.no_grad():
            q_vec = quant.codebook(torch.from_numpy(codes).long())
            hw = IMG // 4
            q_img = q_vec.reshape(2, hw, hw, EDIM).permute(0, 3, 1, 2)
            rec_t = ((dec(q_img) + 1.0) / 2.0).clamp(0, 1).numpy()
        rec_j = model.apply(vars_j, jnp.asarray(codes),
                            method="reconstruct_from_tokens")
        np.testing.assert_allclose(np.asarray(rec_j).transpose(0, 3, 1, 2),
                                   rec_t, rtol=5e-4, atol=5e-4)
        return

    # deterministic quantizers: full forward parity
    with torch.no_grad():
        zq_t, _, _ = quant(z_t)
        rec_t = dec(zq_t).numpy()
    rec_j, _, _ = model.apply(vars_j, jnp.asarray(xn), train=False)
    np.testing.assert_allclose(np.asarray(rec_j).transpose(0, 3, 1, 2),
                               rec_t, rtol=5e-4, atol=5e-4)


def test_flagship_shape_param_parity(torch_ref):
    """The published 256^2 gumbel-VQGAN shape: torch trainable-param count ==
    flax param count, AE+D total ~= the readme's 72.5M trainable (readme.md:152
    counts every Lightning trainable param, i.e. INCLUDING the StyleGAN2
    discriminator; LPIPS is frozen), and the converted state_dict matches the
    flax init tree leaf-for-leaf — no forward compute (eval_shape / numpy)."""
    torch, ref_ae, ref_vq = torch_ref
    torch.manual_seed(0)
    ch, nrb, mult, edim, ncodes, img = 128, 2, (1, 2, 2, 4), 256, 1024, 256

    enc = ref_ae.Encoder(ch, nrb, mult, ncodes)
    dec = ref_ae.Decoder(ch, nrb, mult, edim)
    quant = ref_vq.GumbelVectorQuantizer(ncodes, edim)
    n_torch = sum(p.numel() for m in (enc, dec, quant)
                  for p in m.parameters() if p.requires_grad)

    cfg = _cfg("gumbel", img=img, ch=ch, nrb=nrb, mult=mult, edim=edim,
               ncodes=ncodes)
    model = VQVAE.from_config(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(model_rngs(0, "gumbel"),
                             jnp.zeros((1, img, img, 3), jnp.float32),
                             train=False),
        jax.random.PRNGKey(0))
    n_flax = sum(int(np.prod(l.shape))
                 for l in jax.tree.leaves(shapes["params"]))
    assert n_flax == n_torch

    from vqvae_tpu.models.discriminator import Discriminator
    disc = Discriminator(img_resolution=img)
    d_shapes = jax.eval_shape(
        lambda k: disc.init(k, jnp.zeros((4, img, img, 3), jnp.float32)),
        jax.random.PRNGKey(0))
    n_disc = sum(int(np.prod(l.shape))
                 for l in jax.tree.leaves(d_shapes["params"]))
    assert abs((n_flax + n_disc) - 72.5e6) < 0.5e6  # readme.md:152 "72.5 M"

    # converter output must mirror the flax tree exactly at this full shape
    sd = _lightning_sd(enc, dec, quant)
    variables = convert_vqvae_state_dict(sd, "gumbel", nrb, len(mult))
    flat_conv = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_init = jax.tree_util.tree_flatten_with_path(shapes["params"])[0]
    paths_conv = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    paths_init = {jax.tree_util.keystr(p): tuple(v.shape)
                  for p, v in flat_init}
    assert paths_conv == paths_init
