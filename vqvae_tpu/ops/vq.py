"""Nearest-neighbor code assignment — the VQ hot op.

Reference computes the full (B*H*W, N) L2-distance matrix
``|x|^2 + |c|^2 - 2 x c^T`` in HBM and argmins it
(vector_quantizers.py:37-44). Here the default path is a single XLA matmul
(MXU) followed by a fused argmin; the Pallas path (``impl='pallas'``) tiles
the matmul and performs the argmin reduction in VMEM so the distance matrix
never touches HBM.

Note ``|x|^2`` is constant across codes, so the argmin only needs
``|c|^2 - 2 x c^T`` — one matmul plus a broadcast add.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_IMPL_ENV = "VQVAE_TPU_VQ_IMPL"  # 'xla' | 'pallas' | 'auto'

_FORCED_IMPL: list = []


@contextlib.contextmanager
def forced_impl(impl: str):
    """Trace-time override of the VQ dispatch (beats the env var; explicit
    ``impl=`` arguments still win). Used by paths where the Pallas custom
    call cannot run, e.g. GSPMD spatial partitioning (XLA cannot partition
    a custom call and would all-gather its operands)."""
    _FORCED_IMPL.append(impl)
    try:
        yield
    finally:
        _FORCED_IMPL.pop()


def _dispatch_impl(impl):
    if impl:
        return impl
    if _FORCED_IMPL:
        return _FORCED_IMPL[-1]
    return os.environ.get(_IMPL_ENV, "auto")


def _nearest_codes_xla(flat_x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_n (|x - c_n|^2) via one MXU matmul; |x|^2 term dropped.

    Precision is pinned to HIGHEST: code assignment flips on near-ties under
    low-precision accumulation, and this matmul is negligible next to the
    conv stack (34 GFLOP/step at the reference 256^2 workload).
    """
    c2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)  # (N,)
    xc = jnp.matmul(flat_x.astype(jnp.float32), codebook.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    scores = c2[None, :] - 2.0 * xc  # (M, N)
    return jnp.argmin(scores, axis=1).astype(jnp.int32)


def nearest_codes(flat_x: jnp.ndarray, codebook: jnp.ndarray,
                  impl: str | None = None) -> jnp.ndarray:
    """Nearest codebook indices for flattened latents.

    Args:
      flat_x: (M, D) float latents.
      codebook: (N, D) float codebook.
      impl: 'xla', 'pallas', or None -> $VQVAE_TPU_VQ_IMPL or 'auto'
        (the default: Pallas on TPU backends with aligned shapes —
        M%256==0, N%128==0, D%128==0 — XLA otherwise).

    Returns:
      (M,) int32 indices.
    """
    impl = _dispatch_impl(impl)
    # code assignment is non-differentiable by construction (integer argmin;
    # the quantizer losses route gradients through the codebook LOOKUP, not
    # the assignment) — stop_gradient makes that explicit and keeps the
    # Pallas call out of jvp/linearize traces (pallas_call has no JVP rule,
    # so a train step differentiating past an un-annotated call would fail)
    flat_x = jax.lax.stop_gradient(flat_x)
    codebook = jax.lax.stop_gradient(codebook)
    if impl == "pallas" and not _pallas_ok(flat_x, codebook):
        # explicit request must fail descriptively, not with an opaque
        # lowering error — mirrors nearest_codes_stats dispatch semantics
        raise ValueError(
            "impl='pallas' requested but the VQ Pallas kernel cannot run "
            f"here (backend={_backend_name()!r}, shapes M={flat_x.shape[0]} "
            f"D={flat_x.shape[1]} N={codebook.shape[0]}; needs a TPU backend "
            "and M%256==0, N%128==0, D%128==0)")
    if impl == "pallas" or (impl == "auto" and _pallas_ok(flat_x, codebook)):
        from vqvae_tpu.ops.vq_pallas import nearest_codes_pallas
        return nearest_codes_pallas(flat_x, codebook)
    return _nearest_codes_xla(flat_x, codebook)


def _backend_name() -> str:
    """Backend name for error messages; never takes the caller down."""
    try:
        return jax.default_backend()
    except Exception:
        return "uninitialized"


def _pallas_ok(flat_x, codebook) -> bool:
    """Use the Pallas kernel only on TPU backends with aligned shapes."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    m, d = flat_x.shape
    n = codebook.shape[0]
    return (m % 256 == 0) and (n % 128 == 0) and (d % 128 == 0)


def _nearest_codes_stats_xla(flat_x, codebook):
    """Oracle for the fused kernel: assignment + EMA update statistics."""
    codes = _nearest_codes_xla(flat_x, codebook)
    onehot = jax.nn.one_hot(codes, codebook.shape[0], dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    dw = jnp.matmul(onehot.T, flat_x.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    return codes, counts, dw


def nearest_codes_stats(flat_x: jnp.ndarray, codebook: jnp.ndarray,
                        impl: str | None = None):
    """Nearest-code assignment fused with the codebook-update statistics.

    Returns ``(codes (M,) i32, counts (N,) f32, dw (N, D) f32)`` where
    ``counts[n]`` is the number of latents assigned to code n and ``dw[n]``
    their sum — the EMA quantizer's update inputs. The Pallas path keeps the
    distance AND one-hot matrices in VMEM; the XLA oracle materializes the
    (M, N) one-hot in HBM. Dispatch rules match ``nearest_codes``, plus a
    VMEM-footprint gate for the fused kernel's resident codebook/dw blocks.
    """
    impl = _dispatch_impl(impl)
    # non-differentiable like nearest_codes: counts/dw feed the EMA state
    # update (buffers, never differentiated); see the note there
    flat_x = jax.lax.stop_gradient(flat_x)
    codebook = jax.lax.stop_gradient(codebook)
    if impl == "pallas" and not _pallas_ok(flat_x, codebook):
        # explicit request must not silently run the oracle (debug runs with
        # $VQVAE_TPU_VQ_IMPL=pallas must exercise the fused kernel or fail,
        # matching nearest_codes dispatch semantics)
        raise ValueError(
            "impl='pallas' requested but the fused VQ kernel cannot run here "
            f"(backend={_backend_name()!r}, shapes M={flat_x.shape[0]} "
            f"D={flat_x.shape[1]} N={codebook.shape[0]}; needs a TPU backend "
            "and M%256==0, N%128==0, D%128==0)")
    if impl != "xla" and _pallas_ok(flat_x, codebook):
        from vqvae_tpu.ops.vq_pallas import (
            TILE_M, nearest_codes_stats_pallas, vq_stats_vmem_bytes)
        m, d = flat_x.shape
        n = codebook.shape[0]
        if (impl == "pallas"
                or vq_stats_vmem_bytes(TILE_M, n, d) < 12 * 1024 * 1024):
            return nearest_codes_stats_pallas(flat_x, codebook)
    return _nearest_codes_stats_xla(flat_x, codebook)
