"""Measure the PyTorch reference's OWN training throughput (images/sec).

BASELINE.md's `vs_baseline` denominator is a FLOP-calibrated *proxy* for the
reference running on an A100, because no GPU is reachable from the build
environment and the reference publishes no throughput numbers
(reference readme.md:148-156 is quality-only). This tool replaces the proxy
with a measurement: run it once on a CUDA machine with the reference's
environment (reference environment.yml), then bench this framework with

    VQGAN_A100_BASELINE_IPS=<printed value> python bench.py

so `vs_baseline` becomes measured/measured instead of measured/estimated.

Two modes:

  lightning (mode of record) — drives the reference's actual
      `VQVAE(LightningModule)` through `pl.Trainer.fit` on an in-memory
      synthetic dataset: AMP '16-mixed', manual two-optimizer GAN
      optimization, R1 cadence, LPIPS+StyleGAN2-D — the full pipeline the
      anchor models, Lightning hook overhead included
      (reference train.py:128-142, model.py:232-295). Needs the full
      reference env: pytorch_lightning, kornia, torchvision.
      CAVEAT for the connected-machine operator: this mode's wiring has
      never executed (pytorch_lightning is not installed in the offline
      build environment; tests/test_bench_reference.py covers module mode
      only) — expect possible first-run breakage and sanity-check the
      printed img/s against batch*timed_steps/wall-clock by hand.

  module — a hand-rolled two-optimizer loop over the reference's *modules*
      (Encoder/Decoder/quantizer/VQLPIPSWithDiscriminator), with the batch
      pre-staged on device, no Lightning and no kornia augmentations.
      Everything it omits is overhead, so it reads HIGH — generous to the
      reference, i.e. the conservative direction for this repo's
      vs_baseline. Also the wiring smoke-tested in this offline repo
      (tests/test_bench_reference.py drives it on CPU with an MSE config).

Defaults reproduce the published gumbel-VQGAN recipe at 256^2 / batch 32
per device (reference example_confs/gumbel_vqgan.yaml) with the GAN phase
active (epoch pinned past start_epoch) — the same workload bench.py times.

Prints ONE JSON line: {"metric", "value", "unit", "mode", "device", ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--reference_path", type=str, required=True,
                   help="path to a checkout of the reference repo "
                        "(SerezD/vqvae-vqgan-pytorch-lightning)")
    p.add_argument("--mode", choices=["lightning", "module"],
                   default="lightning")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=32,
                   help="per-device batch (must be %%4==0 when adversarial)")
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--num_res_blocks", type=int, default=2)
    p.add_argument("--channel_multipliers", type=int, nargs="+",
                   default=[1, 2, 2, 4])
    p.add_argument("--quantizer", choices=["gumbel", "standard", "ema",
                                           "entropy"], default="gumbel")
    p.add_argument("--loss", choices=["gan", "mse"], default="gan",
                   help="'gan' = full VQGAN stack (LPIPS + discriminator + "
                        "R1) — the anchor workload; 'mse' = plain "
                        "reconstruction (smoke/ablation)")
    p.add_argument("--warmup_steps", type=int, default=12)
    p.add_argument("--timed_steps", type=int, default=64,
                   help="4 R1 windows by default (r1_reg_every=16)")
    p.add_argument("--no_amp", action="store_true",
                   help="disable fp16 autocast in module mode (lightning "
                        "mode always uses the reference's '16-mixed')")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def build_confs(args):
    """The published recipe (reference example_confs/gumbel_vqgan.yaml),
    parameterized for smoke-scale runs."""
    ae_conf = {"channels": args.channels,
               "num_res_blocks": args.num_res_blocks,
               "channel_multipliers": list(args.channel_multipliers)}
    q_params = {
        "gumbel": {"straight_through": False, "temp": 1.0,
                   "kl_cost": 0.00859375, "kl_warmup_epochs": 0.48,
                   "temp_decay_epochs": 15, "temp_final": 0.0625},
        "standard": {"commitment_cost": 0.25},
        "ema": {"commitment_cost": 0.25, "decay": 0.95, "epsilon": 1e-5},
        "entropy": {"ent_loss_ratio": 0.1, "ent_temperature": 0.01,
                    "ent_loss_type": "softmax", "commitment_cost": 0.25},
    }[args.quantizer]
    q_conf = {"num_embeddings": 1024, "embedding_dim": 256,
              "reinit_every_n_epochs": None, "type": args.quantizer,
              "params": q_params}
    l_conf = None
    if args.loss == "gan":
        l_conf = {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0,
                  "adversarial_params": {"start_epoch": 0,
                                         "loss_type": "non-saturating",
                                         "g_weight": 0.1,
                                         "use_adaptive": False,
                                         "r1_reg_weight": 10.0,
                                         "r1_reg_every": 16}}
    t_conf = {"lr": 1e-4, "betas": (0.0, 0.99), "eps": 1e-8,
              "weight_decay": 1e-4, "warmup_epochs": None,
              "decay_epochs": 250, "max_epochs": 300}
    return ae_conf, q_conf, l_conf, t_conf


def emit(value, args, device, extra=None):
    line = {"metric": "REFERENCE train images/sec/device, "
                      f"{args.image_size}^2 {args.quantizer} "
                      f"{'VQGAN' if args.loss == 'gan' else 'VQ-VAE'}",
            "value": round(value, 2), "unit": "images/sec/device",
            "mode": args.mode, "device": device, "batch": args.batch,
            "timed_steps": args.timed_steps}
    line.update(extra or {})
    print(json.dumps(line))


# ---------------------------------------------------------------------------
def run_lightning(args):
    """The reference pipeline as the reference runs it (train.py:128-142)."""
    import torch
    import pytorch_lightning as pl
    from torch.utils.data import DataLoader, Dataset

    sys.path.insert(0, args.reference_path)
    from vqvae.model import VQVAE  # noqa: the reference's LightningModule

    ae_conf, q_conf, l_conf, t_conf = build_confs(args)
    pl.seed_everything(args.seed, workers=True)
    model = VQVAE(args.image_size, ae_conf, q_conf, l_conf, t_conf,
                  init_cb=True, load_loss=True)

    class Synthetic(Dataset):
        """In-memory random images in [0,1] — isolates the train step +
        H2D from disk I/O, matching bench.py's synthetic-batch policy."""

        def __init__(self, n, size):
            g = torch.Generator().manual_seed(args.seed)
            self.data = torch.rand((n, 3, size, size), generator=g)

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            return self.data[i]

    n_steps = args.warmup_steps + args.timed_steps
    ds = Synthetic(args.batch * 4, args.image_size)  # few distinct batches
    loader = DataLoader(ds, batch_size=args.batch, shuffle=False,
                        num_workers=0, pin_memory=True, drop_last=True)

    times = {}

    class Timer(pl.Callback):
        """Counts BATCHES directly. Do not use trainer.global_step here: the
        reference uses manual optimization (reference model.py:437) with two
        optimizer.step() calls per batch in GAN mode, and PL>=2.0 increments
        global_step once per optimizer.step() — i.e. +2 per batch — which
        would halve the timed window and inflate the measured baseline ~2x
        (ADVICE r4)."""

        def __init__(self):
            self.batches_done = 0

        def on_train_batch_start(self, trainer, *a, **kw):
            if self.batches_done == args.warmup_steps:
                if torch.cuda.is_available():
                    torch.cuda.synchronize()
                times["t0"] = time.perf_counter()

        def on_train_batch_end(self, trainer, *a, **kw):
            self.batches_done += 1
            if self.batches_done >= n_steps:
                if torch.cuda.is_available():
                    torch.cuda.synchronize()
                times["t1"] = time.perf_counter()
                trainer.should_stop = True

    accel = "gpu" if torch.cuda.is_available() else "cpu"
    # max_steps counts optimizer.step() calls (2x per batch in GAN manual
    # optimization) — it is only the backstop; the Timer's batch counter is
    # what actually stops the run via trainer.should_stop
    trainer = pl.Trainer(accelerator=accel, devices=1,
                         precision="16-mixed" if accel == "gpu" else "32",
                         max_steps=2 * n_steps + 2, max_epochs=10_000,
                         logger=False, enable_checkpointing=False,
                         enable_progress_bar=False, callbacks=[Timer()],
                         num_sanity_val_steps=0, limit_val_batches=0)
    trainer.fit(model, train_dataloaders=loader)

    dt = times["t1"] - times["t0"]
    dev = (torch.cuda.get_device_name(0) if torch.cuda.is_available()
           else "cpu")
    emit(args.batch * args.timed_steps / dt, args, dev,
         {"precision": "16-mixed" if accel == "gpu" else "fp32"})


# ---------------------------------------------------------------------------
def run_module(args):
    """Hand-rolled two-optimizer loop over the reference's modules —
    reproduces training_step's compute (model.py:232-264) without Lightning
    or kornia; excludes their overhead, so reads HIGH (generous)."""
    import torch

    sys.path.insert(0, args.reference_path)
    from vqvae.modules.autoencoder import Decoder, Encoder
    from vqvae.modules import vector_quantizers as vq

    torch.manual_seed(args.seed)
    ae_conf, q_conf, l_conf, t_conf = build_confs(args)

    quant = {
        "standard": lambda: vq.VectorQuantizer(
            q_conf["num_embeddings"], q_conf["embedding_dim"],
            q_conf["params"]["commitment_cost"]),
        "ema": lambda: vq.EMAVectorQuantizer(
            q_conf["num_embeddings"], q_conf["embedding_dim"],
            q_conf["params"]["commitment_cost"], q_conf["params"]["decay"],
            q_conf["params"]["epsilon"]),
        "gumbel": lambda: vq.GumbelVectorQuantizer(
            q_conf["num_embeddings"], q_conf["embedding_dim"],
            q_conf["params"]["straight_through"], q_conf["params"]["temp"],
            q_conf["params"]["kl_cost"]),
        "entropy": lambda: vq.EntropyVectorQuantizer(
            q_conf["num_embeddings"], q_conf["embedding_dim"],
            q_conf["params"]["ent_loss_ratio"],
            q_conf["params"]["ent_temperature"],
            q_conf["params"]["ent_loss_type"],
            q_conf["params"]["commitment_cost"]),
    }[args.quantizer]()
    quant.init_codebook()

    enc_out = (q_conf["num_embeddings"] if args.quantizer == "gumbel"
               else q_conf["embedding_dim"])
    encoder = Encoder(ae_conf["channels"], ae_conf["num_res_blocks"],
                      ae_conf["channel_multipliers"], enc_out)
    decoder = Decoder(ae_conf["channels"], ae_conf["num_res_blocks"],
                      ae_conf["channel_multipliers"], q_conf["embedding_dim"])

    criterion = None
    if args.loss == "gan":
        # imports torchvision (LPIPS backbone) — reference env required
        from vqvae.modules.loss.loss import VQLPIPSWithDiscriminator
        criterion = VQLPIPSWithDiscriminator(
            args.image_size, l_conf["l1_weight"], l_conf["l2_weight"],
            l_conf["perc_weight"], l_conf["adversarial_params"])

    use_cuda = torch.cuda.is_available()
    device = torch.device("cuda" if use_cuda else "cpu")
    for m in (encoder, decoder, quant):
        m.to(device).train()
    if criterion is not None:
        criterion.to(device).train()

    params = (list(encoder.parameters()) + list(decoder.parameters())
              + list(quant.parameters()))
    ae_opt = torch.optim.AdamW(params, lr=t_conf["lr"],
                               betas=t_conf["betas"], eps=t_conf["eps"],
                               weight_decay=t_conf["weight_decay"])
    disc_opt = None
    if criterion is not None:
        disc_opt = torch.optim.AdamW(criterion.discriminator.parameters(),
                                     lr=t_conf["lr"], betas=t_conf["betas"],
                                     eps=t_conf["eps"],
                                     weight_decay=t_conf["weight_decay"])

    amp = use_cuda and not args.no_amp
    scaler = torch.amp.GradScaler("cuda", enabled=amp)
    # pre-staged device batch, normalized to (-1, 1) like preprocess_batch
    # (base_autoencoder.py:31-50) minus the random augmentations
    images = (torch.rand((args.batch, 3, args.image_size, args.image_size),
                         device=device) * 2.0 - 1.0)

    def step(i):
        with torch.autocast("cuda", torch.float16, enabled=amp):
            z = encoder(images)
            quantized, used, q_loss = quant(z)
            recon = decoder(quantized)
        if criterion is not None:
            ae_opt.zero_grad(set_to_none=True)
            with torch.autocast("cuda", torch.float16, enabled=amp):
                res = criterion.forward_autoencoder(
                    q_loss, images, recon, 0,
                    last_layer=decoder.conv_out.weight)
            scaler.scale(res[0]).backward()
            scaler.step(ae_opt)
            with torch.autocast("cuda", torch.float16, enabled=amp):
                d_loss = criterion.forward_discriminator(images, recon, 0,
                                                         i)[0]
            disc_opt.zero_grad(set_to_none=True)
            scaler.scale(d_loss).backward()
            scaler.step(disc_opt)
            scaler.update()
        else:
            ae_opt.zero_grad(set_to_none=True)
            loss = q_loss + torch.nn.functional.mse_loss(recon, images)
            scaler.scale(loss).backward()
            scaler.step(ae_opt)
            scaler.update()

    for i in range(args.warmup_steps):
        step(i)
    if use_cuda:
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for i in range(args.warmup_steps, args.warmup_steps + args.timed_steps):
        step(i)
    if use_cuda:
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0

    dev = torch.cuda.get_device_name(0) if use_cuda else "cpu"
    emit(args.batch * args.timed_steps / dt, args, dev,
         {"precision": "fp16-autocast" if amp else "fp32"})


def main():
    args = parse_args()
    if args.loss == "gan" and args.batch % 4 != 0:
        sys.exit("ERROR: adversarial configs need batch % 4 == 0 "
                 "(minibatch-std groups; reference train.py:139-140)")
    if args.mode == "lightning":
        run_lightning(args)
    else:
        run_module(args)


if __name__ == "__main__":
    main()
