"""Decompose VQGAN train-step time: AE-only vs +LPIPS vs +D vs +R1.

Runs the same 256^2 flagship workload as bench.py in four configurations and
prints per-config images/sec, isolating where the step time goes. TPU-only
diagnostics; not part of the driver bench.

Usage: python tools/bench_breakdown.py [--batch 32] [--remat auto|0|1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(image_size, channels, with_loss, with_adv, r1):
    from vqvae_tpu.config import parse_config
    raw = {
        "image_size": image_size,
        "autoencoder": {"channels": channels, "num_res_blocks": 2,
                        "channel_multipliers": [1, 2, 2, 4]},
        "quantizer": {"num_embeddings": 1024, "embedding_dim": 256,
                      "type": "gumbel", "reinit_every_n_epochs": None,
                      "params": {"straight_through": False, "temp": 1.0,
                                 "kl_cost": 0.00859375,
                                 "kl_warmup_epochs": 0.48,
                                 "temp_decay_epochs": 15,
                                 "temp_final": 0.0625}},
        "training": {"cumulative_bs": 256, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 250, "max_epochs": 300},
    }
    if with_loss:
        raw["loss"] = {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0}
        if with_adv:
            raw["loss"]["adversarial_params"] = {
                "start_epoch": 0, "loss_type": "non-saturating",
                "g_weight": 0.1, "use_adaptive": False,
                "r1_reg_weight": 10.0 if r1 else None,
                "r1_reg_every": 16}
    return parse_config(raw)


def time_steps(trainer, state, batch_dict, n=16):
    # host fetch = the only true completion fence under the axon tunnel
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = trainer.train_step(state, batch_dict, epoch=0)
    _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    # default matches bench.py's flagship configuration (remat OFF — the
    # b32 step fits HBM and runs ~15% faster; "auto" = Trainer heuristic)
    ap.add_argument("--remat", default="0")
    ap.add_argument("--configs", default="mse,lpips,gan,gan_r1")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from vqvae_tpu.train.loop import Trainer

    image_size, channels = 256, 128
    remat = None if args.remat == "auto" else args.remat == "1"
    batch = args.batch
    # device-staged like bench.py: the axon tunnel serializes per-step
    # host->device uploads that a real TPU host overlaps with compute
    images = np.random.RandomState(0).randint(
        0, 255, (batch, image_size, image_size, 3), np.uint8)
    batch_dict = {"image": jax.device_put(jnp.asarray(images))}

    variants = {
        "mse": dict(with_loss=False, with_adv=False, r1=False),
        "lpips": dict(with_loss=True, with_adv=False, r1=False),
        "gan": dict(with_loss=True, with_adv=True, r1=False),
        "gan_r1": dict(with_loss=True, with_adv=True, r1=True),
    }
    results = {}
    for name in args.configs.split(","):
        v = variants[name]
        cfg = make_cfg(image_size, channels, **v)
        trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0,
                          steps_per_epoch=1000, mesh=None,
                          compute_dtype=jnp.bfloat16, remat=remat)
        state = trainer.init_state()
        dt = time_steps(trainer, state, batch_dict, n=16)
        results[name] = {"ms/step": round(dt * 1e3, 1),
                         "img/s": round(batch / dt, 1)}
        print(name, results[name], flush=True)
        del trainer, state

    print(json.dumps({"batch": batch, "remat": args.remat, **results}))


if __name__ == "__main__":
    main()
