"""Is the fused D-backward divergence caused by the KERNEL or by the mere
PRESENCE of a Mosaic custom-call in the program?

diag_dbwd_min.py established: five structurally different kernels (Element
windows vs full-plane dslice, alias on/off, db accumulator on/off, tile
32 vs 8) produce BIT-IDENTICAL wrong values in ctx1, including an 18%
divergence of the forward-only loss VALUE — while the interpret-mode kernel
(identical math, no custom-call) is exact. The wrong value cannot depend on
kernel contents it never reads; suspicion: XLA:TPU mis-lowers something
AROUND the opaque Mosaic call (operand relayout / scheduling) on this
axon/libtpu build.

Test: a custom_vjp whose backward is the plain XLA oracle EXCEPT that a
do-nothing Pallas COPY kernel is spliced onto dy first (dp = oracle(copy(dy))).
The copy kernel is trivially correct (single full-array block, out = in).
  - If ctx1 value/grads STILL diverge -> the custom-call interface corrupts
    the program; kernel exonerated; hard quarantine justified.
  - If exact -> the bug is in how Mosaic lowers the real kernel body
    (shared by all five variants: the separable FIR + gate arithmetic).

Run on the real chip: python tools/diag_dbwd_min2.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.diag_dbwd_min import (ALPHA, GAIN, TAPS, cmp, conv_down2,
                                 plain_span)
from vqvae_tpu.ops.fused_dbwd import _blur_t_gate_xla


def pallas_copy(x):
    """Identity via a one-block Pallas kernel (the minimal Mosaic call)."""
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def make_span_with_copy():
    @jax.custom_vjp
    def fused(p0, b0):
        return plain_span(p0, b0)

    def _fwd(p0, b0):
        return plain_span(p0, b0), (p0, b0)

    def _bwd(res, dy):
        p0, b0 = res
        dy = pallas_copy(dy)  # the only non-oracle ingredient
        return _blur_t_gate_xla(dy, p0, b0, TAPS, ALPHA, GAIN)

    fused.defvjp(_fwd, _bwd)
    return fused


def main():
    print(f"backend: {jax.default_backend()}, "
          f"device: {jax.devices()[0].device_kind}")
    rs = np.random.RandomState(0)
    B, H, C = 4, 32, 128
    p0 = jnp.asarray(rs.randn(B, H, H, C), jnp.float32)
    b0 = jnp.asarray(rs.randn(C), jnp.float32)
    w1 = jnp.asarray(rs.randn(3, 3, C, C) * 0.02, jnp.float32)

    # sanity: the copy kernel alone
    y = jnp.asarray(rs.randn(2, 33, 33, 128), jnp.float32)
    err = float(jnp.max(jnp.abs(pallas_copy(y) - y)))
    print(f"standalone pallas copy: max abs err {err:.2e}")

    fused = make_span_with_copy()

    def loss_f(p, b, w):
        return jnp.sum(jnp.tanh(conv_down2(fused(p, b), w)))

    def loss_p(p, b, w):
        return jnp.sum(jnp.tanh(conv_down2(plain_span(p, b), w)))

    v_f, g_f = jax.jit(jax.value_and_grad(loss_f, argnums=(0, 1)))(p0, b0, w1)
    v_p, g_p = jax.jit(jax.value_and_grad(loss_p, argnums=(0, 1)))(p0, b0, w1)
    print(f"ctx1+copy primal: fused {float(v_f):.8f} plain {float(v_p):.8f} "
          f"rel {abs(float(v_f) - float(v_p)) / (abs(float(v_p)) + 1e-9):.3e}")
    cmp("d(p0,b0) oracle-bwd + pallas copy on dy", g_f, g_p)


if __name__ == "__main__":
    main()
