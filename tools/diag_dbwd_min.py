"""Minimal composed-program repro for the fused D-backward divergence.

docs/DIAG_DBWD_r4.txt: the blur_t_gate Pallas kernel is exact standalone at
every block shape, but inside the full-D value_and_grad program both the
grads AND the primal loss diverge deterministically (invariant to the
aliasing and db-accumulator levers). This script rebuilds the composed
context INCREMENTALLY around the same fused span, fp32, tiny shapes (fast
compiles), to find the minimal trigger:

  ctx0: grads of the fused span alone (dy is a constant cotangent)
  ctx1: dy produced by a downstream 3x3 stride-2 conv (the real conv1)
  ctx2: p0 produced by an upstream 3x3 conv (the real conv0)
  ctx3: both (one DiscriminatorBlock minus skip/fromrgb)
  ctx4: ctx3 under value_and_grad (the primal-corruption probe)

Each context compares the fused-custom_vjp composition against the plain
jnp composition (identical math, autodiff backward).

Run on the real chip: python tools/diag_dbwd_min.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.ops.fused_dbwd import make_fused_act_blur
from vqvae_tpu.ops.upfirdn2d import upfirdn2d

TAPS = tuple(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)
ALPHA, GAIN = 0.2, float(np.sqrt(2.0))


def plain_span(p0, b0):
    a = p0 + b0.astype(p0.dtype)
    a = jnp.where(a >= 0, a, ALPHA * a) * GAIN
    f2d = np.outer(np.asarray(TAPS, np.float32), np.asarray(TAPS, np.float32))
    return upfirdn2d(a, f2d, padding=(2, 2, 2, 2))


def conv_down2(y, w):
    # the real conv1: 3x3 stride-2 on the pre-filtered (H+1) tensor
    return jax.lax.conv_general_dilated(
        y, w, window_strides=(2, 2), padding=[(0, 1), (0, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_same(x, w):
    # the real conv0: 3x3 SAME, no bias (bias lives in the fused span)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def cmp(name, got, want, atol=1e-5):
    worst = 0.0
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"  {name}: worst rel {worst:.3e} "
          f"{'OK' if worst < atol else '<<< DIVERGES'}")
    return worst


def main():
    interp = os.environ.get("DIAG_INTERPRET", "0") == "1"
    print(f"backend: {jax.default_backend()}, "
          f"device: {jax.devices()[0].device_kind}, "
          f"interpret={interp}, "
          f"NO_ALIAS={os.environ.get('VQVAE_TPU_DBWD_NO_ALIAS', '')!r}, "
          f"NO_DBACC={os.environ.get('VQVAE_TPU_DBWD_NO_DBACC', '')!r}, "
          f"TILE={os.environ.get('VQVAE_TPU_DBWD_TILE', '')!r}")
    rs = np.random.RandomState(0)
    B, H, C = 4, 32, 128
    p0 = jnp.asarray(rs.randn(B, H, H, C), jnp.float32)
    b0 = jnp.asarray(rs.randn(C), jnp.float32)
    x = jnp.asarray(rs.randn(B, H, H, C), jnp.float32)
    w0 = jnp.asarray(rs.randn(3, 3, C, C) * 0.02, jnp.float32)
    w1 = jnp.asarray(rs.randn(3, 3, C, C) * 0.02, jnp.float32)

    fused = make_fused_act_blur(TAPS, alpha=ALPHA, gain=GAIN,
                                interpret=interp)

    print("== ctx1 attribution: which gradient is wrong? ==")
    for label, argnums in [("dp0", 0), ("db0", 1), ("dw1", 2)]:
        g_f = jax.jit(jax.grad(lambda p, b, w: jnp.sum(
            jnp.tanh(conv_down2(fused(p, b), w))),
            argnums=argnums))(p0, b0, w1)
        g_p = jax.jit(jax.grad(lambda p, b, w: jnp.sum(
            jnp.tanh(conv_down2(plain_span(p, b), w))),
            argnums=argnums))(p0, b0, w1)
        cmp(label, g_f, g_p)
    # primal-value probe for ctx1
    v_f, _ = jax.jit(jax.value_and_grad(lambda p, b, w: jnp.sum(
        jnp.tanh(conv_down2(fused(p, b), w)))))(p0, b0, w1)
    v_p, _ = jax.jit(jax.value_and_grad(lambda p, b, w: jnp.sum(
        jnp.tanh(conv_down2(plain_span(p, b), w)))))(p0, b0, w1)
    print(f"  ctx1 primal: fused {float(v_f):.8f} plain {float(v_p):.8f} "
          f"rel {abs(float(v_f) - float(v_p)) / (abs(float(v_p)) + 1e-9):.3e}")
    if os.environ.get("DIAG_CTX1_ONLY", "0") == "1":
        return

    print("== ctx0: span alone, constant cotangent ==")
    g_f = jax.jit(jax.grad(lambda p, b: jnp.sum(fused(p, b)),
                           argnums=(0, 1)))(p0, b0)
    g_p = jax.jit(jax.grad(lambda p, b: jnp.sum(plain_span(p, b)),
                           argnums=(0, 1)))(p0, b0)
    cmp("d(p0,b0)", g_f, g_p)

    print("== ctx1: dy from downstream stride-2 conv ==")
    g_f = jax.jit(jax.grad(lambda p, b, w: jnp.sum(
        jnp.tanh(conv_down2(fused(p, b), w))), argnums=(0, 1, 2)))(p0, b0, w1)
    g_p = jax.jit(jax.grad(lambda p, b, w: jnp.sum(
        jnp.tanh(conv_down2(plain_span(p, b), w))),
        argnums=(0, 1, 2)))(p0, b0, w1)
    cmp("d(p0,b0,w1)", g_f, g_p)

    print("== ctx2: p0 from upstream conv ==")
    g_f = jax.jit(jax.grad(lambda xx, b, w: jnp.sum(
        fused(conv_same(xx, w), b)), argnums=(0, 1, 2)))(x, b0, w0)
    g_p = jax.jit(jax.grad(lambda xx, b, w: jnp.sum(
        plain_span(conv_same(xx, w), b)), argnums=(0, 1, 2)))(x, b0, w0)
    cmp("d(x,b0,w0)", g_f, g_p)

    print("== ctx3: full mini-block (conv0 -> span -> conv1) ==")

    def block(span):
        def f(xx, b, wa, wb):
            return jnp.sum(jnp.tanh(conv_down2(span(conv_same(xx, wa), b),
                                               wb)))
        return f

    g_f = jax.jit(jax.grad(block(fused), argnums=(0, 1, 2, 3)))(x, b0, w0, w1)
    g_p = jax.jit(jax.grad(block(plain_span),
                           argnums=(0, 1, 2, 3)))(x, b0, w0, w1)
    cmp("d(x,b0,w0,w1)", g_f, g_p)

    print("== ctx4: mini-block value_and_grad (primal corruption probe) ==")
    v_f, g_f = jax.jit(jax.value_and_grad(block(fused),
                                          argnums=(0, 1, 2, 3)))(x, b0, w0, w1)
    v_p, g_p = jax.jit(jax.value_and_grad(block(plain_span),
                                          argnums=(0, 1, 2, 3)))(x, b0, w0, w1)
    print(f"  primal: fused {float(v_f):.8f} plain {float(v_p):.8f} "
          f"rel {abs(float(v_f) - float(v_p)) / (abs(float(v_p)) + 1e-9):.3e}")
    cmp("d(x,b0,w0,w1)", g_f, g_p)


if __name__ == "__main__":
    main()
