"""Fused Pallas nearest-neighbor kernel for vector quantization.

Tiles the latents over the grid; each program computes one
(TILE_M, N) score tile ``|c|^2 - 2 x c^T`` on the MXU with the codebook held
in VMEM, and reduces it to per-row argmin *in VMEM* — the (M, N) distance
matrix never reaches HBM. For the reference workload (M = B*16*16, N = 1024,
D = 256) the codebook is 1 MB fp32 and fits VMEM comfortably.

Replaces the CUDA-side pattern of materializing the full distance matrix
(reference vector_quantizers.py:37-44) with an HBM-bandwidth-optimal design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 256


def _vq_kernel(x_ref, cb_ref, c2_ref, out_ref):
    # x_ref: (TILE_M, D), cb_ref: (N, D), c2_ref: (1, N), out_ref: (TILE_M, 1)
    x = x_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    # scores = |c|^2 - 2 x c^T  (|x|^2 constant per row, irrelevant for argmin)
    # precision HIGHEST to match the XLA oracle exactly: with the default
    # one-pass bf16 MXU accumulation, ~0.4% of assignments flip on near-ties
    # (measured on v5e, M=4096 N=1024 D=256 gaussian data)
    xc = jax.lax.dot_general(
        x, cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_M, N)
    scores = c2_ref[0, :][None, :] - 2.0 * xc
    out_ref[:] = jnp.argmin(scores, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codes_pallas(flat_x: jnp.ndarray, codebook: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """(M, D), (N, D) -> (M,) int32 nearest-code indices."""
    m, d = flat_x.shape
    n = codebook.shape[0]
    # clear errors instead of opaque Mosaic lowering failures
    assert m % TILE_M == 0, f"M={m} must be a multiple of {TILE_M}"
    assert n % 128 == 0, f"N={n} must be a multiple of 128 (MXU lanes)"
    assert d % 128 == 0, f"D={d} must be a multiple of 128 (MXU lanes)"

    c2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, N)

    out = pl.pallas_call(
        _vq_kernel,
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d, bytes_accessed=(m * d + n * d) * 4 + m * 4,
            transcendentals=0),
        interpret=interpret,
    )(flat_x, codebook, c2)
    return out[:, 0]
