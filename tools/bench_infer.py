"""Serving-side throughput bench for the tokenizer/inference API.

The reference exposes get_tokens / reconstruct / reconstruct_from_tokens as
the production inference surface for second-stage models and serving
(reference model.py:458-489). ``bench.py`` covers training; this tool
measures the three jitted inference entry points on one chip:

  - tokenize    get_tokens: [0,1] images -> (B, S) int32 codes
  - reconstruct full AE roundtrip: [0,1] images -> [0,1] images
  - detokenize  reconstruct_from_tokens: (B, S) codes -> [0,1] images

Measurement discipline matches bench.py / PERFORMANCE.md: the axon TPU
tunnel pipelines dispatches past ``block_until_ready``, so each timed window
issues N dispatches *chained through a data dependency* and fences with ONE
device->host readback that transitively depends on the final dispatch.
Median of 3 windows. The synthetic batch is pre-staged on device (host input
throughput is tools/bench_input.py's job).

Prints ONE JSON line, e.g.::

  {"metric": "inference images/sec/chip, 256^2 gumbel VQGAN tokenizer API",
   "batch": 32, "tokenize_ips": ..., "reconstruct_ips": ...,
   "detokenize_ips": ...}

Env knobs: VQGAN_INFER_BATCH (default 32 on TPU / 8 on CPU),
VQGAN_INFER_STEPS (window length, default 16), VQGAN_BENCH_WAIT_S (bounded
backend wait, as in bench.py), JAX_PLATFORMS=cpu for hermetic runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _wait_for_backend  # noqa: E402  (shared outage guard)

METRIC = "inference images/sec/chip, 256^2 gumbel VQGAN tokenizer API"


def _emit_unavailable(reason: str) -> None:
    print(json.dumps({"metric": METRIC, "batch": 0, "tokenize_ips": 0.0,
                      "reconstruct_ips": 0.0, "detokenize_ips": 0.0,
                      "unavailable": reason}))


def _timed_window(step, carry, n_steps: int, fence) -> float:
    """Issue ``n_steps`` chained dispatches, fence with one readback."""
    t0 = time.perf_counter()
    for _ in range(n_steps):
        carry = step(carry)
    fence(carry)
    return time.perf_counter() - t0


def _median3(step, carry, n_steps: int, fence) -> float:
    # warmup/compile + one fenced window before timing
    fence(step(step(carry)))
    return sorted(_timed_window(step, carry, n_steps, fence)
                  for _ in range(3))[1]


def main():
    # hermetic-CPU hook: the env var alone is ignored on this stack (the
    # axon plugin re-registers itself) — translate it into a config update
    # before the first backend touch, like the other tools/ CLIs
    force_cpu = os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"
    if not force_cpu:
        max_wait = float(os.environ.get("VQGAN_BENCH_WAIT_S", 1200))
        if not _wait_for_backend(max_wait):
            _emit_unavailable(
                f"accelerator backend init failed/hung for {max_wait:.0f}s")
            return

    import jax
    import jax.numpy as jnp
    import numpy as np

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("VQVAE_TPU_XLA_OPTS", "none")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.models.vqvae import VQVAE

    on_tpu = jax.default_backend() in ("tpu", "axon")
    image_size = 256 if on_tpu else 32
    channels = 128 if on_tpu else 32
    batch = int(os.environ.get("VQGAN_INFER_BATCH", 32 if on_tpu else 8))
    n_steps = int(os.environ.get("VQGAN_INFER_STEPS", 16))

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
    if not on_tpu:
        raw["autoencoder"]["channel_multipliers"] = [1, 2]
        raw["quantizer"]["num_embeddings"] = 64
        raw["quantizer"]["embedding_dim"] = 16
    cfg = parse_config(raw)

    model = VQVAE.from_config(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    is_gumbel = cfg.quantizer.type == "gumbel"
    # gumbel samples noise even at eval (reference parity, hard=True) — the
    # quantizer therefore needs a "gumbel" rng stream at init and reconstruct
    rngs = {"params": rng, **({"gumbel": rng} if is_gumbel else {})}
    init_img = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    variables = model.init(rngs, init_img, train=False,
                           temp=1.0, kl_cost=0.0)
    apply_rngs = {"gumbel": rng} if is_gumbel else None

    # serving uses inference-time gumbel args (eval temp; kl unused) and
    # deterministic argmax tokens (tokenize_dataset.py default)
    tok_kw = {"deterministic": True} if is_gumbel else {}

    # Each step returns a same-shaped carry PLUS the op's real result as a
    # jit output: the result being an executable output keeps the whole
    # computation alive (a `* 0` chain alone would constant-fold and let XLA
    # dead-code-eliminate the op under test), and the carry chains the next
    # dispatch on this execution's completion at the buffer level.
    @jax.jit
    def tokenize_step(x):
        t = model.apply(variables, x, method="get_tokens", **tok_kw)
        return x + (t.sum() * 0).astype(x.dtype), t

    @jax.jit
    def reconstruct_step(x):
        # naturally chained: [0,1] -> [0,1], same shape
        return model.apply(variables, x, method="reconstruct", temp=1.0,
                           rngs=apply_rngs)

    @jax.jit
    def detokenize_step(t):
        y = model.apply(variables, t, method="reconstruct_from_tokens")
        # mean needs every output pixel — the decoder cannot be narrowed away
        return t + (y.astype(jnp.float32).mean() * 0).astype(t.dtype), y

    images = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(batch, image_size, image_size, 3)
        .astype(np.float32)))
    tokens = jax.device_put(
        model.apply(variables, images, method="get_tokens", **tok_kw))

    dt_tok = _median3(lambda x: tokenize_step(x)[0], images, n_steps,
                      lambda x: float(x.mean()))
    dt_rec = _median3(reconstruct_step, images, n_steps,
                      lambda x: float(x.astype(jnp.float32).mean()))
    dt_det = _median3(lambda t: detokenize_step(t)[0], tokens, n_steps,
                      lambda t: int(t.sum()))

    print(json.dumps({
        "metric": METRIC,
        "batch": batch,
        "tokenize_ips": round(batch * n_steps / dt_tok, 2),
        "reconstruct_ips": round(batch * n_steps / dt_rec, 2),
        "detokenize_ips": round(batch * n_steps / dt_det, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — keep the one-line contract
        import traceback
        traceback.print_exc()
        _emit_unavailable(f"bench failed: {type(exc).__name__}: {exc}"[:300])
