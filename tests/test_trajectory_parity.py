"""Cross-framework N-step TRAINING-TRAJECTORY parity vs the torch reference.

Every other parity test is forward/op-level (weight-copy + one forward); this
module pins that N *optimizer steps* of this framework track N steps of the
reference's training math — the bug class unit parity can't catch
(VERDICT r4 #2):

- AdamW decay/no-decay split + betas(0,0.99)/eps/wd (reference
  model.py:372-440, torch.optim.AdamW semantics vs train/optim.py incl. the
  b1=0 first-moment elision),
- per-batch LR schedule application to every param group of both optimizers
  (model.py:202-216; the LR *values* on the torch side come from this repo's
  native scheduler twin — the scheduling_utils C++ package itself is not
  installable offline; its formula is re-derived and pinned by
  test_schedules — so what this file pins is the application semantics),
- loss composition and the two-phase manual GAN ordering: AE update first,
  D update on the SAME pre-update reconstructions, detached
  (model.py:232-264, loss.py:114-164),
- the R1 cadence every r1_reg_every steps with full second-order parameter
  gradients (loss.py:98-112,144-164 — on torch>=1.10 conv2d_gradfix's
  no_weight_gradients is a no-op fallback, so the reference's R1 DOES
  back-prop through weights, matching our native 2nd-order AD),
- EMA codebook state dynamics across steps (vector_quantizers.py:128-180,
  including the replicated batch-size Laplace-smoothing quirk, PARITY §2.4).

DELIBERATE divergence pinned by test_reference_optimizer_drops_encoder:
the reference's configure_optimizers builds its param dict from *relative*
parameter names of encoder/decoder/quantizer, so every encoder param whose
name collides with a decoder param ('conv_in.weight', 'blocks.{k}.*',
'norm.*', 'conv_out.*') is silently DROPPED from the AE optimizer — in the
published code most of the encoder never trains (only final_residual.* and
non-colliding shortcut convs do). This framework trains all params (the
obvious intent of the karpathy split being replicated); the torch loops here
therefore use the *intended* split (same decay rules, unique names).

Both sides run fp32, no augmentations (Trainer(augment=False) vs feeding
pre-normalized tensors), identical torch-initialized weights, identical
per-step batches.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.config import parse_config
from vqvae_tpu.train.loop import Trainer
from vqvae_tpu.utils.torch_convert import (
    convert_discriminator_state_dict, convert_encoder, convert_decoder,
    convert_quantizer)

CH, NRB, MULT, EDIM, NCODES, IMG = 32, 1, (1, 2), 8, 32, 16
LR = 1e-3          # large enough that 20+ steps move the weights visibly
DECAY_EPOCHS = 1   # cosine decays over ONE epoch => LR moves during the test
BETAS, EPS, WD = (0.0, 0.99), 1e-8, 1e-4
D_CHANNEL_BASE = 512  # tiny discriminator: ch 32 @16, 64 @8, 128 @4


@pytest.fixture(scope="module")
def torch_ref(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules import autoencoder as ref_ae      # noqa
    from vqvae.modules import vector_quantizers as ref_vq  # noqa
    torch.set_num_threads(1)
    return torch, ref_ae, ref_vq


GUMBEL_KL = 0.00859375  # flagship kl_cost (example_confs/gumbel_vqgan.yaml)


def _raw_cfg(q_type: str, gan: bool, r1_every: int = 4,
             perc_weight: float = 0.0, use_adaptive: bool = False,
             loss_type: str = "non-saturating", start_epoch: int = 0) -> dict:
    raw = {
        "image_size": IMG,
        "autoencoder": {"channels": CH, "num_res_blocks": NRB,
                        "channel_multipliers": list(MULT)},
        "quantizer": {"num_embeddings": NCODES, "embedding_dim": EDIM,
                      "type": q_type, "reinit_every_n_epochs": None,
                      "params": {
                          "standard": {"commitment_cost": 0.25},
                          "ema": {"commitment_cost": 0.25, "decay": 0.95,
                                  "epsilon": 1e-5},
                          "entropy": {"ent_loss_ratio": 0.1,
                                      "ent_temperature": 0.01,
                                      "ent_loss_type": "softmax",
                                      "commitment_cost": 0.25},
                          # both gumbel schedules MOVE inside a 24-step
                          # window (steps_per_epoch == n_steps): kl warms up
                          # over half an epoch, temp decays over one
                          "gumbel": {"straight_through": False, "temp": 1.0,
                                     "kl_cost": GUMBEL_KL,
                                     "kl_warmup_epochs": 0.5,
                                     "temp_decay_epochs": 1,
                                     "temp_final": 0.0625},
                      }[q_type]},
        "training": {"cumulative_bs": 8, "base_lr": LR, "betas": list(BETAS),
                     "eps": EPS, "weight_decay": WD,
                     "decay_epochs": DECAY_EPOCHS, "max_epochs": 300},
    }
    if gan:
        raw["loss"] = {
            "l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": perc_weight,
            "adversarial_params": {"start_epoch": start_epoch,
                                   "loss_type": loss_type,
                                   "g_weight": 0.1,
                                   "use_adaptive": use_adaptive,
                                   "r1_reg_weight": 10.0,
                                   "r1_reg_every": r1_every}}
    return raw


def _build_torch_ae(torch, ref_ae, ref_vq, q_type: str, seed: int = 0):
    torch.manual_seed(seed)
    if q_type == "standard":
        quant = ref_vq.VectorQuantizer(NCODES, EDIM, 0.25)
    elif q_type == "ema":
        quant = ref_vq.EMAVectorQuantizer(NCODES, EDIM, 0.25, 0.95, 1e-5)
    elif q_type == "gumbel":
        quant = ref_vq.GumbelVectorQuantizer(NCODES, EDIM,
                                             straight_through=False,
                                             temp=1.0, kl_cost=GUMBEL_KL)
    else:
        quant = ref_vq.EntropyVectorQuantizer(NCODES, EDIM, 0.1, 0.01,
                                              "softmax", 0.25)
    quant.init_codebook()
    # gumbel: the encoder emits num_embeddings logits channels, not the
    # embedding dim (reference model.py:130-132)
    enc = ref_ae.Encoder(CH, NRB, MULT,
                         NCODES if q_type == "gumbel" else EDIM)
    dec = ref_ae.Decoder(CH, NRB, MULT, EDIM)
    return enc, dec, quant


def _intended_ae_optimizer(torch, ref_ae, modules):
    """The reference's decay/no-decay INTENT (model.py:372-410: Conv2d
    weights decay; biases, Embedding and GroupNorm weights don't) with
    collision-free parameter identity (see module docstring)."""
    decay, no_decay = [], []
    for mod in modules:
        for _, m in mod.named_modules():
            for pn, p in m.named_parameters(recurse=False):
                if pn.endswith("bias"):
                    no_decay.append(p)
                elif isinstance(m, torch.nn.Conv2d):
                    decay.append(p)
                else:  # Embedding / GroupNorm weights
                    no_decay.append(p)
    groups = [{"params": decay, "weight_decay": WD},
              {"params": no_decay, "weight_decay": 0.0}]
    return torch.optim.AdamW(groups, lr=LR, betas=BETAS, eps=EPS,
                             weight_decay=WD)


def _jax_state_from_torch(trainer, enc_t, dec_t, quant_t, q_type,
                          disc_t=None):
    """init_state() then overwrite params/vq_state with the torch weights and
    re-init both optimizer states over the copied trees."""
    sd = {f"encoder.{k}": v.detach().numpy()
          for k, v in enc_t.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy()
               for k, v in dec_t.state_dict().items()})
    sd.update({f"quantizer.{k}": v.detach().numpy()
               for k, v in quant_t.state_dict().items()})

    state = trainer.init_state()
    params = dict(state.params)
    params["encoder"] = convert_encoder(sd, NRB, len(MULT))
    params["decoder"] = convert_decoder(sd, NRB, len(MULT))
    q_params, vq_state = convert_quantizer(sd, q_type)
    if q_params:
        params["quantizer"] = q_params
    params = jax.tree.map(jnp.asarray, params)
    replace = dict(params=params, opt_state=trainer.tx.init(params))
    if vq_state is not None:
        replace["vq_state"] = jax.tree.map(jnp.asarray,
                                           {"quantizer": vq_state})
    if disc_t is not None:
        dsd = {k: v.detach().numpy() for k, v in disc_t.state_dict().items()}
        d_params = jax.tree.map(
            jnp.asarray,
            convert_discriminator_state_dict(dsd, IMG,
                                             channel_base=D_CHANNEL_BASE))
        replace["disc_params"] = d_params
        replace["disc_opt_state"] = trainer.disc_tx.init(d_params)
    return state.replace(**replace)


def _set_lr(opts, lr: float):
    """on_train_batch_start semantics (model.py:202-216): one LR for every
    param group of every optimizer, set BEFORE the step."""
    for opt in opts:
        for g in opt.param_groups:
            g["lr"] = lr


def _run_jax(trainer, state, batches, epoch_of=None):
    traj = []
    for i, b in enumerate(batches):
        state, metrics = trainer.train_step(
            state, {"image": jnp.asarray(b)},
            epoch=epoch_of(i) if epoch_of else 0)
        traj.append({k: float(v) for k, v in jax.device_get(metrics).items()})
    return traj, state


# ---------------------------------------------------------------------------
def _mse_trajectory(torch, ref_ae, ref_vq, q_type, batches, lr_fn,
                    consts_fn=None):
    enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, q_type)
    for m in (enc, dec, quant):
        m.train()
    opt = _intended_ae_optimizer(torch, ref_ae, [enc, dec, quant])
    mse = torch.nn.MSELoss()
    traj = []
    for i, b in enumerate(batches):
        _set_lr([opt], lr_fn(i))
        if consts_fn is not None:  # gumbel temp/kl per-batch set_consts
            quant.set_consts(*consts_fn(i))
        x = torch.from_numpy(b).permute(0, 3, 1, 2) * 2.0 - 1.0
        z = enc(x)
        quantized, _, q_loss = quant(z)
        recon = dec(quantized)
        l2 = mse(recon, x)
        loss = q_loss + l2  # reference model.py:266-275 (MSE branch, fixed return)
        opt.zero_grad()
        loss.backward()
        opt.step()
        traj.append({"loss": float(loss), "l2_loss": float(l2),
                     "quant_loss": float(q_loss)})
    return traj, (enc, dec, quant)


@pytest.mark.parametrize("q_type", ["standard", "ema", "entropy"])
def test_mse_trajectory_parity(torch_ref, q_type):
    torch, ref_ae, ref_vq = torch_ref
    n_steps, batch = 24, 8
    rs = np.random.RandomState(42)
    batches = rs.rand(n_steps, batch, IMG, IMG, 3).astype(np.float32)

    cfg = parse_config(_raw_cfg(q_type, gan=False))
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=n_steps, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False)
    try:
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, q_type)
        state = _jax_state_from_torch(trainer, enc, dec, quant, q_type)
        traj_j, state = _run_jax(trainer, state, batches)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        traj_t, _ = _mse_trajectory(torch, ref_ae, ref_vq, q_type, batches,
                                    lr_fn)
    finally:
        trainer.native_lr.destroy()

    for key in ("loss", "l2_loss", "quant_loss"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        np.testing.assert_allclose(
            j, t, rtol=5e-3, atol=1e-5,
            err_msg=f"{q_type} '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")
    # the trajectory must actually move (a frozen model would trivially agree)
    losses = np.array([m["loss"] for m in traj_j])
    assert losses[-1] < losses[0] * 0.9, losses


def test_mse_trajectory_parity_gumbel(torch_ref, monkeypatch):
    """Gumbel-family trajectory parity — the flagship quantizer, runnable
    cross-framework only with the gumbel NOISE zeroed on both sides (torch
    and JAX draw from unrelated RNG streams; zero noise keeps every other
    moving part live: the temp-decay and kl-warmup schedules applied
    per-batch (reference model.py:189-230), the soft (non-straight-through)
    codebook mixing, the KL(q||uniform) loss (vector_quantizers.py:236-241),
    and the x_to_logits-conv/codebook optimizer dynamics)."""
    torch, ref_ae, ref_vq = torch_ref
    n_steps, batch = 24, 8
    rs = np.random.RandomState(3)
    batches = rs.rand(n_steps, batch, IMG, IMG, 3).astype(np.float32)

    # JAX side: zero the gumbel draw (trace-time capture — patch BEFORE the
    # first train_step compiles)
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    # torch side: F.gumbel_softmax minus the noise, semantics otherwise
    # identical (torch functional.py: softmax((logits+g)/tau), hard =
    # one-hot(argmax) + straight-through)
    def det_gumbel_softmax(logits, tau=1.0, hard=False, eps=1e-10, dim=-1):
        y_soft = (logits / tau).softmax(dim)
        if hard:
            idx = y_soft.argmax(dim, keepdim=True)
            y_hard = torch.zeros_like(y_soft).scatter_(dim, idx, 1.0)
            return y_hard - y_soft.detach() + y_soft
        return y_soft

    monkeypatch.setattr(torch.nn.functional, "gumbel_softmax",
                        det_gumbel_softmax)

    cfg = parse_config(_raw_cfg("gumbel", gan=False))
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=n_steps, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False)
    try:
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "gumbel")
        state = _jax_state_from_torch(trainer, enc, dec, quant, "gumbel")
        traj_j, state = _run_jax(trainer, state, batches)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        # per-batch set_consts with the SAME schedule functions the jitted
        # step evaluates (their formulas are pinned separately by
        # test_schedules) — what this pins is the application semantics
        consts_fn = lambda i: (float(trainer.temp_sched(i)),
                               float(trainer.kl_sched(i)))
        traj_t, _ = _mse_trajectory(torch, ref_ae, ref_vq, "gumbel", batches,
                                    lr_fn, consts_fn=consts_fn)
    finally:
        trainer.native_lr.destroy()

    for key in ("loss", "l2_loss", "quant_loss"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        np.testing.assert_allclose(
            j, t, rtol=5e-3, atol=1e-5,
            err_msg=f"gumbel '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")
    # the schedules must have actually moved inside the window
    assert float(trainer.temp_sched(n_steps - 1)) < 0.5
    assert float(trainer.kl_sched(0)) < GUMBEL_KL / 4
    assert float(trainer.kl_sched(n_steps - 1)) > GUMBEL_KL * 0.99
    losses = np.array([m["loss"] for m in traj_j])
    assert losses[-1] < losses[0] * 0.9, losses


def _install_fake_torchvision(torch, lpp):
    """Inject the torchvision-replica fake (test_lpips_parity pattern) if no
    earlier test already did; harmless when one did (same seed, same build
    order => numerically identical replica weights)."""
    import types

    if "torchvision" in sys.modules:
        return
    torch.manual_seed(0)
    replicas = {net: lpp._MAKERS[net](torch).eval() for net in lpp._MAKERS}
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.vgg16 = lambda weights=None, **kw: types.SimpleNamespace(
        features=replicas["vgg"])
    models.alexnet = lambda pretrained=None, **kw: types.SimpleNamespace(
        features=replicas["alex"])
    models.squeezenet1_1 = (
        lambda pretrained=None, **kw: types.SimpleNamespace(
            features=replicas["squeeze"]))
    models.VGG16_Weights = types.SimpleNamespace(DEFAULT="default")
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models


def _export_lpips_weights(torch, lpp, net_type, out_dir):
    """Build the reference LPIPS (replica backbone + seeded lin heads), run
    the real converter CLI on its exact weights, return the module. The flax
    side then loads the identical function via VQVAE_TPU_LPIPS_WEIGHTS_DIR."""
    import os
    import subprocess
    from pathlib import Path

    from vqvae.modules.loss.lpips_pytorch.modules import (
        networks as ref_networks)
    from vqvae.modules.loss.lpips_pytorch.modules import (
        lpips as ref_lpips_mod)
    lp_ref = lpp._build_reference_lpips(torch, ref_networks, ref_lpips_mod,
                                        net_type, seed=7)
    repo = Path(__file__).resolve().parent.parent
    getter = {"vgg": "vgg16", "alex": "alexnet",
              "squeeze": "squeezenet1_1"}[net_type]
    backbone = getattr(sys.modules["torchvision"].models, getter)().features
    torch.save(backbone.state_dict(), out_dir / "backbone.pth")
    torch.save(lp_ref.lin.state_dict(), out_dir / "lin.pth")
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "convert_lpips_weights.py"),
         "--net", net_type, "--out", str(out_dir),
         "--backbone_pth", str(out_dir / "backbone.pth"),
         "--lin_pth", str(out_dir / "lin.pth")],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "PYTHONPATH": str(repo)})
    assert out.returncode == 0, out.stderr
    return lp_ref


def test_mse_trajectory_parity_vqlpips(torch_ref, reference_path, tmp_path,
                                       monkeypatch):
    """The reference's THIRD criterion branch (VQLPIPS — a loss: config block
    WITHOUT adversarial_params, model.py:139-140,266-271): per-step loss =
    l1*w1 + l2*w2 + p_loss*pw + q_loss with the ALEX LPIPS backbone
    (loss.py:182; the Trainer mirrors the vgg-under-GAN / alex-otherwise
    choice). 32px input — alexnet's stride-4 stem + 3 pools floor to zero
    below that. Identical LPIPS weights both sides via the converter CLI."""
    torch, ref_ae, ref_vq = torch_ref

    import test_lpips_parity as lpp
    _install_fake_torchvision(torch, lpp)
    lp_ref = _export_lpips_weights(torch, lpp, "alex", tmp_path)
    monkeypatch.setenv("VQVAE_TPU_LPIPS_WEIGHTS_DIR", str(tmp_path))

    size, n_steps, batch = 32, 12, 4
    l1w, l2w, pw = 0.8, 0.2, 1.0
    rs = np.random.RandomState(13)
    batches = rs.rand(n_steps, batch, size, size, 3).astype(np.float32)

    raw = _raw_cfg("standard", gan=False)
    raw["image_size"] = size
    raw["loss"] = {"l1_weight": l1w, "l2_weight": l2w, "perc_weight": pw}
    cfg = parse_config(raw)
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=n_steps, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False)
    assert trainer.disc is None  # VQLPIPS: no discriminator subsystem
    try:
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
        state = _jax_state_from_torch(trainer, enc, dec, quant, "standard")
        traj_j, _ = _run_jax(trainer, state, batches)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        # hand-rolled VQLPIPS loop (loss.py:185-193 + the MSE-branch update
        # protocol: single AdamW, loss.backward, step)
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
        for m in (enc, dec, quant):
            m.train()
        opt = _intended_ae_optimizer(torch, ref_ae, [enc, dec, quant])
        traj_t = []
        for i, b in enumerate(batches):
            _set_lr([opt], lr_fn(i))
            x = torch.from_numpy(b).permute(0, 3, 1, 2) * 2.0 - 1.0
            z = enc(x)
            quantized, _, q_loss = quant(z)
            recon = dec(quantized)
            l1 = (x - recon).abs().mean()
            l2 = (x - recon).pow(2).mean()
            p = lp_ref(x, recon)
            loss = l1 * l1w + l2 * l2w + p * pw + q_loss
            opt.zero_grad()
            loss.backward()
            opt.step()
            traj_t.append({"loss": float(loss), "l1_loss": float(l1),
                           "l2_loss": float(l2), "quant_loss": float(q_loss),
                           "perc_loss": float(p)})
    finally:
        trainer.native_lr.destroy()

    for key in ("loss", "l1_loss", "l2_loss", "quant_loss", "perc_loss"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        # two-tier like the GAN legs: first steps tight (measured <=1e-6 abs
        # over steps 0-2 — any composition bug would show there), full window
        # loose for the b1=0-AdamW sign-chaos; quant_loss drifts furthest
        # (argmin assignments flip as the 32px latents drift — measured rel
        # ~0.12 by step 8 vs ~0.02 for the pixel/perceptual terms)
        np.testing.assert_allclose(
            j[:3], t[:3], rtol=1e-4, atol=1e-5,
            err_msg=f"VQLPIPS '{key}' diverged in the first 3 steps:\n"
                    f"jax   = {j}\ntorch = {t}")
        np.testing.assert_allclose(
            j, t, rtol=2e-1 if key == "quant_loss" else 5e-2, atol=5e-4,
            err_msg=f"VQLPIPS '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")
    # perceptual term live and the model actually learning
    assert min(m["perc_loss"] for m in traj_j) > 1e-4
    losses = np.array([m["loss"] for m in traj_j])
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
def _gan_trajectory(torch, ref_ae, ref_vq, reference_path, batches, lr_fn,
                    r1_every, perc_weight=0.0, use_adaptive=False,
                    lpips_mod=None, loss_type="non-saturating",
                    start_epoch=0, steps_per_epoch=None):
    """Hand-rolled reference GAN loop: training_step's manual two-optimizer
    protocol (model.py:232-264) + forward_autoencoder/forward_discriminator
    composition (loss.py:114-164) with perc_weight=0, use_adaptive=False.

    generator/discriminator losses are transcribed from reference
    loss.py:11-51 (non-saturating branch) rather than imported: importing
    vqvae.modules.loss.loss pulls the LPIPS subsystem, whose torchvision
    dependency is absent in this offline environment."""
    from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
        Discriminator as RefDiscriminator)
    F = torch.nn.functional

    def generator_loss(logits, loss_type="non-saturating"):
        if loss_type == "hinge":  # loss.py:16-17
            return -torch.mean(logits)
        assert loss_type == "non-saturating"
        return F.binary_cross_entropy_with_logits(
            logits, target=torch.ones_like(logits))

    def discriminator_loss(logits_real, logits_fake,
                           loss_type="non-saturating"):
        if loss_type == "hinge":  # loss.py:36-38,52
            return torch.mean(F.relu(1.0 - logits_real)
                              + F.relu(1.0 + logits_fake))
        assert loss_type == "non-saturating"
        real = F.binary_cross_entropy_with_logits(
            logits_real, target=torch.ones_like(logits_real),
            reduction="none")
        fake = F.binary_cross_entropy_with_logits(
            logits_fake, target=torch.zeros_like(logits_fake),
            reduction="none")
        return torch.mean(real + fake)

    enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
    torch.manual_seed(1)  # same seed as the copy the jax side imported
    disc = RefDiscriminator(IMG, channel_base=D_CHANNEL_BASE)
    for m in (enc, dec, quant, disc):
        m.train()
    ae_opt = _intended_ae_optimizer(torch, ref_ae, [enc, dec, quant])
    # uniform decay on every D param (model.py:431-434)
    disc_opt = torch.optim.AdamW(disc.parameters(), lr=LR, betas=BETAS,
                                 eps=EPS, weight_decay=WD)
    l1w, l2w, g_weight, r1_cost = 0.8, 0.2, 0.1, 10.0

    traj = []
    for i, b in enumerate(batches):
        # pre-GAN epochs (current_epoch < start_epoch): the AE optimizer
        # still steps on nll + q_loss with g_weight = 0 (loss.py:138-141)
        # and the D optimizer never steps (model.py:260-264, loss None)
        epoch_i = (i // steps_per_epoch) if steps_per_epoch else 0
        gan_on = epoch_i >= start_epoch
        _set_lr([ae_opt, disc_opt], lr_fn(i))
        x = torch.from_numpy(b).permute(0, 3, 1, 2) * 2.0 - 1.0
        z = enc(x)
        quantized, _, q_loss = quant(z)
        recon = dec(quantized)

        # ---- AE phase (forward_autoencoder, loss.py:114-141) -------------
        ae_opt.zero_grad()
        l1 = (x - recon).abs().mean()
        l2 = (x - recon).pow(2).mean()
        p_loss = (lpips_mod(x, recon) if lpips_mod is not None
                  else torch.zeros(()))
        nll = l1 * l1w + l2 * l2w + p_loss * perc_weight
        if gan_on:
            logits_fake = disc(recon)
            g_loss = generator_loss(logits_fake, loss_type=loss_type)
            if use_adaptive:
                # calculate_adaptive_weight (loss.py:80-96) at the
                # model.py:250 callsite: grads of the UNWEIGHTED p_loss and
                # of g_loss w.r.t. decoder.conv_out.weight
                w = dec.conv_out.weight
                p_grads = torch.autograd.grad(p_loss, w,
                                              retain_graph=True)[0]
                g_grads = torch.autograd.grad(g_loss, w,
                                              retain_graph=True)[0]
                gw = (p_grads.detach().norm(2)
                      / (g_grads.detach().norm(2) + 1e-8))
                gw = torch.clamp(gw, 0.0, 1e4).detach() * g_weight
            else:
                gw = torch.as_tensor(g_weight)
            ae_loss = nll + g_loss * gw + q_loss
        else:
            g_loss, gw = torch.zeros(()), torch.zeros(())
            ae_loss = nll + q_loss
        ae_loss.backward()
        ae_opt.step()

        # ---- D phase (forward_discriminator, loss.py:143-164) ------------
        if gan_on:
            # the R1 cadence runs on the GLOBAL step (model.py:257), not a
            # GAN-phase-relative one
            compute_r1 = i % r1_every == 0
            xr = x.detach().clone().requires_grad_(compute_r1)
            logits_real = disc(xr)
            logits_fake2 = disc(recon.detach())
            d_loss = discriminator_loss(logits_real, logits_fake2,
                                        loss_type=loss_type)
            if compute_r1:
                # no_weight_gradients is a no-op fallback on torch>=1.10
                # (conv2d_gradfix.py:47-56): full 2nd-order gradients flow
                grads = torch.autograd.grad(logits_real.sum(), xr,
                                            create_graph=True)[0]
                r1 = r1_cost * grads.pow(2).reshape(
                    grads.shape[0], -1).sum(1).mean()
                loss_d = d_loss + r1
            else:
                r1 = torch.zeros(())
                loss_d = d_loss
            disc_opt.zero_grad()
            loss_d.backward()
            disc_opt.step()
        else:
            d_loss, r1 = torch.zeros(()), torch.zeros(())

        traj.append({"loss": float(ae_loss), "l1_loss": float(l1),
                     "l2_loss": float(l2), "quant_loss": float(q_loss),
                     "gen_loss": float(g_loss), "disc_loss": float(d_loss),
                     "r1_penalty": float(r1), "perc_loss": float(p_loss),
                     "g_weight": float(gw)})
    return traj, disc


@pytest.mark.parametrize("loss_type", ["non-saturating", "hinge"])
def test_gan_trajectory_parity(torch_ref, reference_path, loss_type):
    torch, ref_ae, ref_vq = torch_ref
    n_steps, batch, r1_every = 12, 4, 4
    rs = np.random.RandomState(7)
    batches = rs.rand(n_steps, batch, IMG, IMG, 3).astype(np.float32)

    cfg = parse_config(_raw_cfg("standard", gan=True, r1_every=r1_every,
                                loss_type=loss_type))
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=n_steps, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False,
                      disc_kwargs={"channel_base": D_CHANNEL_BASE})
    try:
        # build torch modules FIRST so both sides share their initial weights
        from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
            Discriminator as RefDiscriminator)
        torch.manual_seed(0)
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
        torch.manual_seed(1)
        disc_t = RefDiscriminator(IMG, channel_base=D_CHANNEL_BASE)

        state = _jax_state_from_torch(trainer, enc, dec, quant, "standard",
                                      disc_t=disc_t)
        traj_j, _ = _run_jax(trainer, state, batches)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        # fresh modules with the SAME seeds so the torch loop starts identical
        torch.manual_seed(0)
        traj_t, _ = _gan_trajectory(torch, ref_ae, ref_vq, reference_path,
                                    batches, lr_fn, r1_every,
                                    loss_type=loss_type)
    finally:
        trainer.native_lr.destroy()

    # two-tier tolerance: fp32 op-order differences amplify chaotically as
    # weights drift apart — through the argmin assignment, and (dominant
    # here) through the b1=0 AdamW update, whose early step is ~lr*sign(g)
    # per element, so a near-zero gradient's fp32 rounding flips a whole
    # O(lr) update. Early steps (where any optimizer/schedule/composition
    # bug would already show) are held tight and the full window loose.
    # hinge amplifies faster than non-saturating (measured: all keys agree
    # to <2e-6 abs over steps 0-1, then grow ~10x/step; no hinge-kink flips
    # involved — every relu stays active at these logit scales), so its
    # tight window is shorter but far tighter.
    n_tight, tight_r, tight_a, full_r, full_a = {
        "non-saturating": (6, 5e-3, 1e-4, 8e-2, 2e-4),
        "hinge": (2, 1e-4, 1e-5, 3e-1, 5e-2),
    }[loss_type]
    for key in ("loss", "l1_loss", "l2_loss", "quant_loss", "gen_loss",
                "disc_loss", "r1_penalty"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        np.testing.assert_allclose(
            j[:n_tight], t[:n_tight], rtol=tight_r, atol=tight_a,
            err_msg=f"GAN '{key}' diverged in the first {n_tight} steps:\n"
                    f"jax   = {j}\ntorch = {t}")
        np.testing.assert_allclose(
            j, t, rtol=full_r, atol=full_a,
            err_msg=f"GAN '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")
    # R1 fires exactly on the cadence, both sides
    r1_j = np.array([m["r1_penalty"] for m in traj_j])
    assert (r1_j[::r1_every] > 0).all()
    mask = np.ones(n_steps, bool)
    mask[::r1_every] = False
    assert (r1_j[mask] == 0).all()


def test_gan_trajectory_parity_start_epoch(torch_ref, reference_path):
    """Pre-GAN -> GAN phase-transition trajectory (start_epoch=1): pins that
    (a) pre-GAN steps train the AE on nll + q_loss with g_weight 0 and NO
    discriminator update (reference loss.py:138-141, model.py:260-264), so
    the AE optimizer enters the GAN phase with 4 steps of AdamW history
    while D's state is fresh; (b) the loss branch flips exactly at
    current_epoch == start_epoch; (c) the R1 cadence runs on the GLOBAL
    step (model.py:257) — with r1_every=3 and the phase starting at global
    step 4, R1 must fire at step 6, not at the phase-relative step 4."""
    torch, ref_ae, ref_vq = torch_ref
    steps_per_epoch, start_epoch, r1_every = 4, 1, 3
    n_steps, batch = 8, 4
    rs = np.random.RandomState(5)
    batches = rs.rand(n_steps, batch, IMG, IMG, 3).astype(np.float32)

    cfg = parse_config(_raw_cfg("standard", gan=True, r1_every=r1_every,
                                start_epoch=start_epoch))
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=steps_per_epoch, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False,
                      disc_kwargs={"channel_base": D_CHANNEL_BASE})
    epoch_of = lambda i: i // steps_per_epoch
    try:
        from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
            Discriminator as RefDiscriminator)
        torch.manual_seed(0)
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
        torch.manual_seed(1)
        disc_t = RefDiscriminator(IMG, channel_base=D_CHANNEL_BASE)

        state = _jax_state_from_torch(trainer, enc, dec, quant, "standard",
                                      disc_t=disc_t)
        traj_j, _ = _run_jax(trainer, state, batches, epoch_of=epoch_of)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        torch.manual_seed(0)
        traj_t, _ = _gan_trajectory(torch, ref_ae, ref_vq, reference_path,
                                    batches, lr_fn, r1_every,
                                    start_epoch=start_epoch,
                                    steps_per_epoch=steps_per_epoch)
    finally:
        trainer.native_lr.destroy()

    for key in ("loss", "l1_loss", "l2_loss", "quant_loss", "gen_loss",
                "disc_loss", "r1_penalty"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        np.testing.assert_allclose(
            j[:6], t[:6], rtol=5e-3, atol=1e-4,
            err_msg=f"start-epoch GAN '{key}' diverged early:\n"
                    f"jax   = {j}\ntorch = {t}")
        np.testing.assert_allclose(
            j, t, rtol=8e-2, atol=2e-4,
            err_msg=f"start-epoch GAN '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")

    g = np.array([m["gen_loss"] for m in traj_j])
    d = np.array([m["disc_loss"] for m in traj_j])
    r1 = np.array([m["r1_penalty"] for m in traj_j])
    # phase boundary exact: zeros through epoch 0, live from step 4
    assert (g[:4] == 0).all() and (d[:4] == 0).all() and (r1[:4] == 0).all()
    assert (np.abs(d[4:]) > 0).all()
    # global-step R1 cadence: fires at step 6 only within the GAN phase
    assert r1[6] > 0
    assert (r1[[4, 5, 7]] == 0).all()


def test_gan_trajectory_parity_adaptive_lpips(torch_ref, reference_path,
                                              tmp_path, monkeypatch):
    """Full-VQGAN loss-composition trajectory: LPIPS perceptual term ACTIVE
    (perc_weight=1) and the ADAPTIVE generator weight ON — the two reference
    branches the plain GAN leg runs with weight 0/off. Pins in particular
    calculate_adaptive_weight (reference loss.py:80-96): λ = |∇_W p_loss| /
    (|∇_W g_loss| + 1e-8) clamped to 1e4, W = decoder.conv_out.weight — note
    the model.py:250 callsite feeds the UNWEIGHTED p_loss, not the nll of
    the Taming paper; both sides replicate that quirk.

    Identical LPIPS weights on both sides via the test_lpips_parity
    machinery: random torchvision-replica backbone + seeded lin heads on the
    torch side, exported through the real converter CLI and loaded by the
    Trainer via $VQVAE_TPU_LPIPS_WEIGHTS_DIR."""
    import test_lpips_parity as lpp

    torch, ref_ae, ref_vq = torch_ref
    _install_fake_torchvision(torch, lpp)
    lp_ref = _export_lpips_weights(torch, lpp, "vgg", tmp_path)
    monkeypatch.setenv("VQVAE_TPU_LPIPS_WEIGHTS_DIR", str(tmp_path))

    n_steps, batch, r1_every = 10, 4, 4
    rs = np.random.RandomState(11)
    batches = rs.rand(n_steps, batch, IMG, IMG, 3).astype(np.float32)

    cfg = parse_config(_raw_cfg("standard", gan=True, r1_every=r1_every,
                                perc_weight=1.0, use_adaptive=True))
    trainer = Trainer(cfg=cfg, learning_rate=LR, seed=0,
                      steps_per_epoch=n_steps, mesh=None,
                      compute_dtype=jnp.float32, remat=False, augment=False,
                      disc_kwargs={"channel_base": D_CHANNEL_BASE})
    try:
        from vqvae.modules.loss.stylegan2_discriminator.discriminator import (
            Discriminator as RefDiscriminator)
        torch.manual_seed(0)
        enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")
        torch.manual_seed(1)
        disc_t = RefDiscriminator(IMG, channel_base=D_CHANNEL_BASE)

        state = _jax_state_from_torch(trainer, enc, dec, quant, "standard",
                                      disc_t=disc_t)
        traj_j, _ = _run_jax(trainer, state, batches)

        lr_fn = lambda i: float(trainer.native_lr.step(i))
        torch.manual_seed(0)
        traj_t, _ = _gan_trajectory(torch, ref_ae, ref_vq, reference_path,
                                    batches, lr_fn, r1_every,
                                    perc_weight=1.0, use_adaptive=True,
                                    lpips_mod=lp_ref)
    finally:
        trainer.native_lr.destroy()

    for key in ("loss", "l1_loss", "l2_loss", "quant_loss", "perc_loss",
                "gen_loss", "g_weight", "disc_loss", "r1_penalty"):
        j = np.array([m[key] for m in traj_j])
        t = np.array([m[key] for m in traj_t])
        # g_weight is a ratio of gradient NORMS — the most chaos-amplified
        # quantity here — so its early window gets a slightly wider band
        tight = 2e-2 if key == "g_weight" else 5e-3
        np.testing.assert_allclose(
            j[:4], t[:4], rtol=tight, atol=1e-4,
            err_msg=f"adaptive-GAN '{key}' diverged in the first 4 steps:\n"
                    f"jax   = {j}\ntorch = {t}")
        np.testing.assert_allclose(
            j, t, rtol=1.5e-1, atol=5e-4,
            err_msg=f"adaptive-GAN '{key}' trajectories diverged:\n"
                    f"jax   = {j}\ntorch = {t}")
    # the adaptive weight must be live (not pinned at the constant) and the
    # perceptual term non-degenerate
    gw = np.array([m["g_weight"] for m in traj_j])
    assert np.std(gw) > 0 and not np.allclose(gw, 0.1)
    assert min(m["perc_loss"] for m in traj_j) > 1e-4


# ---------------------------------------------------------------------------
def test_reference_optimizer_drops_encoder(torch_ref):
    """Executable citation for the documented divergence: the reference's
    split_decay_groups (model.py:372-410) keys its param dict by RELATIVE
    names, so encoder params whose names collide with decoder params never
    reach the AE optimizer — most of the encoder is silently frozen in the
    published code. This framework deliberately trains all params."""
    torch, ref_ae, ref_vq = torch_ref
    enc, dec, quant = _build_torch_ae(torch, ref_ae, ref_vq, "standard")

    # the reference's literal split semantics (model.py:383-410)
    named_modules = (list(enc.named_modules()) + list(dec.named_modules())
                     + list(quant.named_modules()))
    named_parameters = (list(enc.named_parameters())
                        + list(dec.named_parameters())
                        + list(quant.named_parameters()))
    decay, no_decay = set(), set()
    for mn, m in named_modules:
        for pn, _ in m.named_parameters():
            fpn = "%s.%s" % (mn, pn) if mn else pn
            if pn.endswith("bias"):
                no_decay.add(fpn)
            elif pn.endswith("weight") and isinstance(m, torch.nn.Conv2d):
                decay.add(fpn)
            elif pn.endswith("weight") and isinstance(
                    m, (torch.nn.Embedding, ref_ae.GroupNorm)):
                no_decay.add(fpn)
    param_dict = {pn: p for pn, p in named_parameters}
    # the reference's own completeness asserts PASS (collisions hide the gap)
    assert not (decay & no_decay)
    assert not (param_dict.keys() - (decay | no_decay))

    in_opt = {id(param_dict[pn]) for pn in decay | no_decay}
    dropped = [n for n, p in enc.named_parameters() if id(p) not in in_opt]
    # conv_in / conv_out / norm / every blocks.* ResBlock collide and drop
    assert "conv_in.weight" in dropped
    assert any(n.startswith("blocks.") for n in dropped)
    assert len(dropped) >= len(list(enc.named_parameters())) // 2
    # decoder + quantizer params all survive (their names win the collision)
    for n, p in list(dec.named_parameters()) + list(quant.named_parameters()):
        assert id(p) in in_opt, n
