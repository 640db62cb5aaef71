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


def _vq_stats_kernel(x_ref, cb_ref, c2_ref, codes_ref, counts_ref, dw_ref):
    # x: (TILE_M, D), cb: (N, D), c2: (1, N)
    # codes: (TILE_M, 1) i32; counts: (1, N) f32 and dw: (N, D) f32 are
    # ACCUMULATED across the grid (their index_map pins the same block every
    # step; sequential TPU grid => deterministic accumulation order)
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    n = cb.shape[0]
    xc = jax.lax.dot_general(
        x, cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TILE_M, N)
    scores = c2_ref[0, :][None, :] - 2.0 * xc
    codes = jnp.argmin(scores, axis=1)
    codes_ref[:] = codes[:, None].astype(jnp.int32)

    # one-hot stays in VMEM: the codebook-update statistics
    #   counts = sum_rows onehot,  dw = onehot^T @ x
    # never materialize the (M, N) matrix in HBM (the XLA path does)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], n), 1)
              == codes[:, None]).astype(jnp.float32)
    tile_counts = jnp.sum(onehot, axis=0, keepdims=True)          # (1, N)
    tile_dw = jax.lax.dot_general(                                 # (N, D)
        onehot, x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: the default one-pass MXU rounds x to bf16 inside the
        # product (measured 6e-2 dw error vs the fp32 oracle on v5e)
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(i == 0)
    def _():
        counts_ref[:] = tile_counts
        dw_ref[:] = tile_dw

    @pl.when(i != 0)
    def _():
        counts_ref[:] = counts_ref[:] + tile_counts
        dw_ref[:] = dw_ref[:] + tile_dw


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codes_stats_pallas(flat_x: jnp.ndarray, codebook: jnp.ndarray,
                               interpret: bool = False):
    """Fused assignment + codebook-update statistics.

    (M, D), (N, D) -> (codes (M,) i32, counts (N,) f32, dw (N, D) f32) with
    counts[n] = |{m : codes[m] = n}| and dw[n] = sum of x rows assigned to n
    — the EMA quantizer's update inputs (reference vector_quantizers.py:
    159-169), computed without writing the distance or one-hot matrices to
    HBM.
    """
    m, d = flat_x.shape
    n = codebook.shape[0]
    assert m % TILE_M == 0, f"M={m} must be a multiple of {TILE_M}"
    assert n % 128 == 0, f"N={n} must be a multiple of 128 (MXU lanes)"
    assert d % 128 == 0, f"D={d} must be a multiple of 128 (MXU lanes)"

    c2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]

    codes, counts, dw = pl.pallas_call(
        _vq_stats_kernel,
        grid=(m // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_M, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((n, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * d * 2,
            bytes_accessed=(m * d + 2 * n * d) * 4 + m * 4 + n * 4,
            transcendentals=0),
        interpret=interpret,
    )(flat_x, codebook, c2)
    return codes[:, 0], counts[0], dw


def vq_stats_vmem_bytes(m_tile: int, n: int, d: int) -> int:
    """Rough VMEM footprint of the fused stats kernel (gating heuristic)."""
    # scores + onehot tiles, codebook, dw accumulator, x tile (fp32)
    return 4 * (2 * m_tile * n + 2 * n * d + m_tile * d)


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
