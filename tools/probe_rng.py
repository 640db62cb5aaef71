"""On-chip microbench: gumbel-noise RNG cost in the flagship train step.

The gumbel quantizer samples gumbel noise over the full logits tensor every
micro-step (quantizers.py:gumbel_softmax; reference vector_quantizers.py's
F.gumbel_softmax does the same on CUDA). At the flagship shape that is
B32 x 32 x 32 x 1024 = 33.5M samples/micro-step. JAX's default threefry2x32
is counter-based crypto-ish RNG costing dozens of VPU ops per 32-bit draw;
TPU has a hardware rng-bit-generator HLO that the 'rbg' impl uses instead.

This probe measures, on the real chip with chained-readback fencing:
  1. threefry gumbel draw at the flagship logits shape
  2. rbg gumbel draw at the same shape
  3. both fused into a softmax((logits+g)/tau) consumer (the real context,
     so XLA can fuse the draw into the consumer the way the step does)

If (1)-(2) is material, routing the hot-loop gumbel draw through rbg is a
legitimate TPU-native lever (stream changes, distribution identical — the
reference's torch stream differs from ours anyway).

Run: python tools/probe_rng.py   (~1 min warm)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (32, 32, 32, 1024)  # flagship logits: b32, 32x32 latents, 1024 codes


def _time(fn, carry, n=32, reps=3):
    """Chained-carry timing: the axon tunnel pipelines past
    block_until_ready, so chain iterations through the carry and fence with
    one device->host readback (bench.py methodology)."""
    for _ in range(2):
        carry = fn(carry)
    _ = float(jnp.sum(carry[1]))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = carry
        for _ in range(n):
            c = fn(c)
        _ = float(jnp.sum(c[1]))
        times.append((time.perf_counter() - t0) / n * 1e3)
    return sorted(times)[1]


def main():
    print(f"backend: {jax.default_backend()}, "
          f"device: {jax.devices()[0].device_kind}, shape {SHAPE}")
    logits = jnp.asarray(np.random.RandomState(0).randn(*SHAPE), jnp.float32)

    def make(impl):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def draw(carry):
            k, _ = carry
            k, sub = jax.random.split(k)
            g = jax.random.gumbel(sub, SHAPE, jnp.float32)
            return k, g

        @jax.jit
        def draw_softmax(carry):
            k, _ = carry
            k, sub = jax.random.split(k)
            g = jax.random.gumbel(sub, SHAPE, jnp.float32)
            y = jax.nn.softmax((logits + g) / 0.9, axis=-1)
            return k, y

        return key, draw, draw_softmax

    @jax.jit
    def softmax_only(carry):
        k, y = carry
        y = jax.nn.softmax((logits + y) / 0.9, axis=-1)
        return k, y

    results = {}
    for impl in ("threefry2x32", "rbg", "unsafe_rbg"):
        try:
            key, draw, draw_softmax = make(impl)
            carry = (key, jnp.zeros(SHAPE, jnp.float32))
            t_draw = _time(draw, carry)
            t_full = _time(draw_softmax, carry)
            results[impl] = (t_draw, t_full)
            print(f"{impl:14s} gumbel draw {t_draw:7.3f} ms   "
                  f"draw+softmax {t_full:7.3f} ms")
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{impl:14s} unavailable: {type(exc).__name__}: {exc}")

    k0 = jax.random.key(0)
    t_sm = _time(softmax_only, (k0, jnp.zeros(SHAPE, jnp.float32)))
    print(f"{'softmax only':14s} {'':21s} {t_sm:7.3f} ms")
    if "threefry2x32" in results and "rbg" in results:
        d = results["threefry2x32"][1] - results["rbg"][1]
        print(f"\nrbg saves {d:.3f} ms/micro-step in context "
              f"(x8 micro-steps = {8 * d:.2f} ms per accumulated step; "
              f"flagship step is ~2900 ms)")


if __name__ == "__main__":
    main()
