"""Measure the single-chip tokenization resolution ceiling (honesty probe).

parallel/spatial.py extends the tokenizer's resolution reach by sharding
image HEIGHT across a mesh — but on this 1-chip box its multi-chip halo
performance is CPU-verified only. The *measured* capability claim is the
single-chip ceiling this probe establishes: it runs `get_tokens` (flagship
encoder, random weights — memory footprint is weight-independent) at
doubling resolutions on the real chip until allocation fails, reporting
per-resolution wall time and the analytic HBM activation estimate.

    python tools/probe_max_resolution.py [--channels 128] [--start 256]

Prints one line per resolution and a final summary; see PERFORMANCE.md
"Spatial partitioning / resolution ceiling" for recorded results.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def activation_estimate_gb(res: int, channels: int) -> float:
    """Rough peak live-set estimate for the encoder forward at `res`:
    a handful of consecutive full-res bf16 tensors at `channels` width
    dominate (conv_in output + ResBlock intermediates); deeper levels add
    a geometric tail. ~4 x res^2 x channels x 2 bytes."""
    return 4 * res * res * channels * 2 / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--start", type=int, default=256)
    ap.add_argument("--max", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.models.vqvae import VQVAE, model_rngs

    res = args.start
    last_ok = None
    while res <= args.max:
        raw = {
            "image_size": res,
            "autoencoder": {"channels": args.channels, "num_res_blocks": 2,
                            "channel_multipliers": [1, 2, 2, 4]},
            "quantizer": {"num_embeddings": 1024, "embedding_dim": 256,
                          "type": "gumbel", "reinit_every_n_epochs": None,
                          "params": {"straight_through": False, "temp": 1.0,
                                     "kl_cost": 0.0, "kl_warmup_epochs": 1,
                                     "temp_decay_epochs": 1,
                                     "temp_final": 0.0625}},
            "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                         "betas": [0.0, 0.99], "eps": 1e-8,
                         "weight_decay": 0.0, "decay_epochs": 1,
                         "max_epochs": 1},
        }
        cfg = parse_config(raw)
        model = VQVAE.from_config(cfg, dtype=jnp.bfloat16)
        try:
            # init at a tiny size (params are resolution-independent), then
            # apply at the probe resolution
            small = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = model.init(model_rngs(0, "gumbel"), small,
                                   train=False)
            x = jnp.asarray(np.zeros((1, res, res, 3), np.uint8))

            fn = jax.jit(lambda v, im: model.apply(
                v, im.astype(jnp.float32) / 255.0, method="get_tokens",
                deterministic=True))
            t0 = time.perf_counter()
            tokens = fn(variables, x)
            np.asarray(tokens)  # device->host readback = true fence (axon)
            dt = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(fn(variables, x))
            warm = time.perf_counter() - t0
            print(f"res={res}: OK tokens={tuple(tokens.shape)} "
                  f"compile+run={dt:.1f}s warm={warm * 1e3:.0f}ms "
                  f"est_act={activation_estimate_gb(res, args.channels):.2f}GB",
                  flush=True)
            last_ok = res
            res *= 2
        except Exception as exc:  # noqa: BLE001 — OOM/alloc failures expected
            print(f"res={res}: FAIL {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
            break

    print(f"single-chip tokenization ceiling (batch 1, ch={args.channels}): "
          f"{last_ok}")


if __name__ == "__main__":
    main()
