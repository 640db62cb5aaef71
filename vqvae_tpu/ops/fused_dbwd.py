"""Fused StyleGAN2-D backward: blur-transpose ⊙ lrelu-gate + bias-grad.

The discriminator's hot backward fusion class (PERFORMANCE.md "Discriminator
bwd"): for every DiscriminatorBlock, the cotangent arriving from conv1's
input-grad conv-transpose must be pushed back through the [1,3,3,1] FIR
low-pass and conv0's fused bias+lrelu (reference bias_act.cu grad kernels +
upfirdn2d.cu:246-264 analytic adjoint; here the whole reference chain is
conv2d_resample.py:59-154 → bias_act.py:55). XLA autodiff compiles this as
one elementwise fusion per block — measured 530–646 GB/s on v5e against an
~819 GB/s roofline. This module provides the same computation as ONE Pallas
kernel with a *separable* two-pass FIR transpose (8 taps/element instead of
the outer-product 16) streaming VMEM-resident row tiles:

    dP0 = blur_T(dY) ⊙ gain·lrelu'(P0 + b0)      (full-res, per block)
    db0 = Σ_{B,H,W} dP0                           (fp32 accumulation)

``fused_act_blur`` is the integration point: a ``jax.custom_vjp`` spanning
conv0's bias_act and conv1's FIR blur (the primal is EXACTLY the existing
ops — forward fusion landscape unchanged); only its backward is replaced.
Residuals are (P0, b0), both materialized by the forward anyway (a conv
output and a parameter) — no extra forward HBM traffic.

NOT twice-differentiable (custom_vjp): the R1-staged step keeps the plain
XLA path for the D-at-images linearization (train/steps.py).

Dispatch mirrors ops/vq.py: 'auto' uses Pallas on TPU backends with aligned
shapes, XLA otherwise; explicit impl='pallas' raises descriptively when the
kernel can't run.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqvae_tpu.ops.upfirdn2d import upfirdn2d

_IMPL_ENV = "VQVAE_TPU_DBWD_IMPL"  # 'xla' | 'pallas' | 'auto'

_LANES = 128

# QUARANTINE (round 4, docs/DIAG_DBWD_r4.txt): on this axon/libtpu stack,
# splicing ANY Mosaic custom-call into this backward position corrupts the
# surrounding compiled program — five structurally different kernels
# (Element windows / full-plane dslice, alias on/off, db accumulator
# on/off, tile 32/8) produce BIT-IDENTICAL wrong grads AND an 18%-wrong
# forward loss value, and a trivially-correct Pallas COPY kernel spliced
# onto dy reproduces the divergence (minimal reproducer + bisection log:
# docs/DIAG_DBWD_r4.txt) while
# interpret mode (no custom-call) is exact. The kernels themselves are
# oracle-exact at every block shape standalone. Until the stack is fixed,
# 'auto' never lowers the compiled kernels; the custom_vjp backward runs
# the XLA oracle (identical math to plain autodiff). Interpret mode (tests)
# is unaffected. VQVAE_TPU_DBWD_UNSAFE=1 restores the compiled kernels for
# diagnosis.
#
# UN-QUARANTINE-OR-DELETE CRITERION (re-checked every round by running
# `python tools/validate_tpu.py` on the real chip — its composed-program
# probes exercise exactly this splice position):
#   - if the composed probes PASS on an updated axon/libtpu stack: re-A/B
#     the fused-D legs once (tools/chipq.sh dbwd:VQVAE_TPU_FUSED_DBWD=1
#     dbwdskip:VQVAE_TPU_FUSED_DBWD=1,VQVAE_TPU_FUSED_SKIP=1). Keep and
#     default-on only if >= +1% vs base (round-4 XLA reading was
#     -9.6%/-21%, so a pass alone does NOT justify keeping it); otherwise
#     DELETE this module and its tests (the reproducer value lives in
#     docs/DIAG_DBWD_r4.txt, not in the code).
#   - if the probes still fail: the quarantine stands; record the dated log
#     (docs/VALIDATE_r{N}.md).
_UNSAFE_ENV = "VQVAE_TPU_DBWD_UNSAFE"
_warned_quarantine = False


def _quarantined() -> bool:
    global _warned_quarantine
    if os.environ.get(_UNSAFE_ENV) == "1":
        return False
    if not _warned_quarantine:
        _warned_quarantine = True
        import warnings
        warnings.warn(
            "fused D-backward Pallas kernels are quarantined on compiled "
            "TPU backends (Mosaic custom-calls corrupt composed programs "
            "on this stack — docs/DIAG_DBWD_r4.txt); the fused-backward "
            "custom_vjp runs its XLA oracle instead. "
            f"Set {_UNSAFE_ENV}=1 to override for diagnosis.")
    return True


def _dispatch_impl(impl):
    if impl:
        return impl
    return os.environ.get(_IMPL_ENV, "auto")


def _backend_name() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "uninitialized"


def _row_tile(h: int) -> int:
    """Largest tile ≤ cap dividing H (D resolutions are powers of two).

    The cap trades halo re-reads (3/tile extra G traffic for the gate
    kernel) against VMEM block size; VQVAE_TPU_DBWD_TILE overrides for
    on-chip tuning (default 32 ≈ 9% halo overhead, ~7 MB blocks at C=128).
    """
    cap = int(os.environ.get("VQVAE_TPU_DBWD_TILE", "32"))
    for t in (64, 32, 16, 8, 4, 2, 1):
        if t <= cap and h % t == 0:
            return t
    return 1


def _pallas_ok(dy, p0) -> bool:
    """Pallas path: TPU backend, lane-aligned channels, 4-tap blur shapes."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    b, hy, wy, c = dy.shape
    _, h, w, _ = p0.shape
    return (c % _LANES == 0) and hy == h + 1 and wy == w + 1


# ---------------------------------------------------------------------------
# XLA oracle
# ---------------------------------------------------------------------------

def _blur_t_gate_xla(dy, p0, b0, taps, alpha, gain):
    """Reference backward in plain jnp (also the non-TPU dispatch target).

    The adjoint of ``upfirdn2d(·, f, padding=(2,2,2,2))`` (4-tap, up=down=1)
    is the correlation with the same filter under the transpose-pad identity
    q = fw - 1 - p = 1 (reference upfirdn2d.py:246-264 uses the same
    flip/pad-transpose construction for its CUDA backward).
    """
    f2d = np.outer(np.asarray(taps, np.float32), np.asarray(taps, np.float32))
    da = upfirdn2d(dy, f2d, padding=(1, 1, 1, 1), flip_filter=True)
    s = p0 + b0.astype(p0.dtype)
    gate = jnp.where(s >= 0, gain, gain * alpha).astype(jnp.float32)
    dp0 = (da.astype(jnp.float32) * gate).astype(p0.dtype)
    db0 = jnp.sum(da.astype(jnp.float32) * gate, axis=(0, 1, 2))
    return dp0, db0.astype(b0.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _make_kernel(taps, alpha, gain, tile, h, w, with_db=True,
                 full_dy=False):
    t0, t1, t2, t3 = (float(t) for t in taps)
    gain = float(gain)
    alpha = float(alpha)

    def kernel(dy_ref, p0_ref, b0_ref, dp_ref, db_ref=None):
        b = pl.program_id(1)
        hi = pl.program_id(2)

        # dy arrives PRE-PADDED by one zero row/col low and two high (done
        # in XLA by the caller — Mosaic supports neither low element-padding
        # nor non-aligned W halos, and the pad costs one negligible
        # elementwise pass); block rows are padded rows
        # [hi*tile, hi*tile + tile + 3) = unpadded [hi*tile - 1, ...).
        if full_dy:
            # VQVAE_TPU_DBWD_FULLDY: the whole padded (h+4, w+4) plane is
            # the block (revisited across hi); take the overlapping row
            # window with an in-kernel dynamic slice instead of a
            # pl.Element window spec (whose composed-program Mosaic
            # lowering miscompiles on this stack — docs/DIAG_DBWD_r4.txt)
            g = dy_ref[pl.dslice(hi * tile, tile + 3), :, :].astype(
                jnp.float32)                          # (tile+3, w+4, c)
        else:
            g = dy_ref[...].astype(jnp.float32)       # (tile+3, w+4, c)

        # separable FIR transpose: dA[i,j] = Σ_{s,t} f[s] f[t] dY[i-1+s, j-1+t]
        v = (t0 * g[0:tile] + t1 * g[1:tile + 1]
             + t2 * g[2:tile + 2] + t3 * g[3:tile + 3])   # (tile, w+4, c)
        u = (t0 * v[:, 0:w] + t1 * v[:, 1:w + 1]
             + t2 * v[:, 2:w + 2] + t3 * v[:, 3:w + 3])   # (tile, w, c)

        # gate from the bf16/f32 sum exactly as bias_act computes it
        # (b.astype(x.dtype); sign decides the lrelu branch, x>=0 -> slope 1).
        # Arithmetic indicator instead of jnp.where: the i1 mask vector from
        # a broadcasted comparison trips a Mosaic relayout bug ("non-
        # singleton logical dimension is replicated in destination").
        # NaN note: for non-finite s, sign(NaN)=NaN so gate=NaN here, while
        # the XLA oracle's where(s>=0) picks the alpha branch — either way
        # dp is NaN (u*gate vs u*finite with u already NaN-poisoned upstream
        # only matters for already-diverged training), so the divergence is
        # accepted rather than paying an extra NaN-insensitive select.
        p = p0_ref[...]
        s = (p + b0_ref[0].astype(p.dtype)).astype(jnp.float32)
        ind = jnp.minimum(jnp.sign(s) + 1.0, 1.0)         # 1.0 iff s >= 0
        gate = gain * alpha + (gain - gain * alpha) * ind  # f32 weights
        dp = u * gate
        dp_ref[...] = dp.astype(dp_ref.dtype)

        if with_db:
            @pl.when((b == 0) & (hi == 0))
            def _():
                db_ref[...] = jnp.zeros_like(db_ref)
            db_ref[...] += jnp.sum(dp, axis=(0, 1))[None, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("taps", "alpha", "gain",
                                              "interpret", "tile"))
def blur_t_gate_pallas(dy, p0, b0, taps, alpha, gain, interpret=False,
                       tile=None):
    """One-pass fused D-backward kernel.

    Args:
      dy: (B, H+1, W+1, C) cotangent of the blurred tensor (conv1's
        conv-transpose output).
      p0: (B, H, W, C) conv0 pre-bias output (gate source residual).
      b0: (C,) fp32 conv0 bias.
      taps: static 1-D FIR taps, DC-normalized ([1,3,3,1]/8).
      alpha, gain: lrelu slope / bias_act gain (static).

    Returns:
      dp0 (B, H, W, C) in p0.dtype, db0 (C,) fp32.
    """
    bsz, h1, w1, c = dy.shape
    h, w = h1 - 1, w1 - 1
    assert p0.shape == (bsz, h, w, c), (p0.shape, dy.shape)
    assert len(taps) == 4 and c % _LANES == 0
    # tile is a STATIC arg resolved by callers (env reads inside a jitted
    # body would be baked into the first trace and silently reused)
    tile = tile or _row_tile(h)
    assert h % tile == 0

    # VQVAE_TPU_DBWD_NO_DBACC=1: drop the revisited fp32 bias-grad
    # accumulator output and compute db as an XLA reduce over dp instead —
    # diagnostic for the composed-program divergence (the skip kernel, which
    # has no revisit accumulator, composes correctly; this isolates whether
    # the multi-output revisit accumulation is what Mosaic miscompiles in
    # larger programs). Read at trace time (fresh process per diag leg).
    with_db = os.environ.get("VQVAE_TPU_DBWD_NO_DBACC") != "1"
    full_dy = os.environ.get("VQVAE_TPU_DBWD_FULLDY") == "1"
    kernel = _make_kernel(taps, alpha, gain, tile, h, w, with_db=with_db,
                          full_dy=full_dy)
    grid = (c // _LANES, bsz, h // tile)

    # pre-pad in XLA: Mosaic supports neither low element-padding nor
    # non-aligned W block halos, so give every overlapping row window a
    # non-negative in-bounds offset instead. One elementwise pass over dy
    # (~2 reads+writes of a cotangent tensor) — negligible vs the fusion
    # this kernel replaces.
    dy_pad = jnp.pad(dy, ((0, 0), (1, 2), (1, 2), (0, 0)))

    out_specs = [
        pl.BlockSpec((None, tile, w, _LANES),
                     lambda ci, bi, hi: (bi, hi, 0, ci),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((bsz, h, w, c), p0.dtype)]
    if with_db:
        # fp32 bias-grad accumulator: same block for every (b, hi) of a
        # given channel tile (c is the OUTERMOST grid dim, so revisits
        # are consecutive)
        out_specs.append(pl.BlockSpec((1, _LANES),
                                      lambda ci, bi, hi: (0, ci),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, c), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full-plane block with in-kernel row slicing (FULLDY) or
            # overlapping element-offset row windows (stride tile, size
            # tile+3) over the padded array; W/C full-width/128-aligned per
            # Mosaic's last-two-dims block rule
            (pl.BlockSpec((None, h + 4, w + 4, _LANES),
                          lambda ci, bi, hi: (bi, 0, 0, ci),
                          memory_space=pltpu.VMEM)
             if full_dy else
             pl.BlockSpec(
                 (None, pl.Element(tile + 3), pl.Element(w + 4),
                  pl.Element(_LANES)),
                 lambda ci, bi, hi: (bi, hi * tile, 0, ci * _LANES),
                 memory_space=pltpu.VMEM)),
            pl.BlockSpec((None, tile, w, _LANES),
                         lambda ci, bi, hi: (bi, hi, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda ci, bi, hi: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        # write dp0 in place over p0 (same shape/dtype; the kernel is p0's
        # last consumer). Besides saving an allocation, this pins the output
        # buffer explicitly: without it, buffer assignment under fused
        # forward+backward programs was observed (v5e, axon stack) to place
        # dp0 over a still-live forward tensor, corrupting the primal
        # outputs (see PERFORMANCE.md round-3 notes).
        # VQVAE_TPU_DBWD_NO_ALIAS=1 disables the donation — diagnostic lever
        # for composed-program divergence (docs/DIAG_DBWD_r4.txt): a hard
        # donation of a residual that buffer assignment still considers live
        # is the converse corruption mode.
        input_output_aliases=(
            {} if os.environ.get("VQVAE_TPU_DBWD_NO_ALIAS") == "1"
            else {1: 0}),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dy_pad, p0, b0.astype(jnp.float32).reshape(1, c))
    if with_db:
        dp0, db0 = outs
        return dp0, db0[0].astype(b0.dtype)
    dp0 = outs[0]
    return dp0, jnp.sum(dp0.astype(jnp.float32),
                        axis=(0, 1, 2)).astype(b0.dtype)


def blur_t_gate(dy, p0, b0, taps, alpha, gain, impl=None, interpret=False):
    """Dispatching fused D-backward (see module docstring)."""
    impl = _dispatch_impl(impl)
    ok = _pallas_ok(dy, p0) or interpret
    if impl == "pallas" and not ok:
        raise ValueError(
            "impl='pallas' requested but the fused D-backward kernel cannot "
            f"run here (backend={_backend_name()!r}, dy={dy.shape}, "
            f"p0={p0.shape}; needs a TPU backend and C%128==0)")
    if impl == "pallas" or (impl == "auto" and ok
                            and (interpret or not _quarantined())):
        return blur_t_gate_pallas(dy, p0, b0, tuple(float(t) for t in taps),
                                  float(alpha), float(gain),
                                  interpret=interpret,
                                  tile=_row_tile(p0.shape[1]))
    return _blur_t_gate_xla(dy, p0, b0, taps, alpha, gain)


# ---------------------------------------------------------------------------
# skip-path adjoint: up-dilated blur-transpose fused with the cotangent add
# ---------------------------------------------------------------------------

def _skip_fanout_bwd_xla(dc, dys, taps):
    """Oracle for the skip-path backward: the adjoint of the down-2 FIR
    (``upfirdn2d(x, f, down=2, padding=(1,1,1,1))``, conv2d_resample's 1x1
    pointwise branch) is the up-2 FIR with transpose pads (2,1) — verified
    against autodiff — summed with the conv0-branch cotangent (the fan-out
    add JAX inserts at the block input)."""
    f2d = np.outer(np.asarray(taps, np.float32), np.asarray(taps, np.float32))
    da = upfirdn2d(dys, f2d, up=2, padding=(2, 1, 2, 1), flip_filter=True)
    return dc + da.astype(dc.dtype)


def _make_skip_kernel(taps, tile, h, w):
    t0, t1, t2, t3 = (float(t) for t in taps)
    th, hh, wh = tile // 2, h // 2, w // 2

    def kernel(dc_ref, dys_ref, out_ref):
        # dys arrives PRE-PADDED by one zero row/col on each side (XLA-side;
        # Mosaic supports no low element-padding): block rows are padded
        # [hi*th, hi*th + th + 2) = unpadded [hi*th - 1, ...).
        d = dys_ref[...].astype(jnp.float32)          # (th+2, wh+2, c)

        # phase-split zero-stuffed transpose: even output rows see taps
        # (f0, f2) of dys rows (m-1, m); odd rows taps (f1, f3) of (m, m+1)
        re = t0 * d[0:th] + t2 * d[1:th + 1]           # (th, wh+2, c)
        ro = t1 * d[1:th + 1] + t3 * d[2:th + 2]
        r = jnp.stack([re, ro], axis=1).reshape(tile, wh + 2, d.shape[-1])
        ce = t0 * r[:, 0:wh] + t2 * r[:, 1:wh + 1]     # (tile, wh, c)
        co = t1 * r[:, 1:wh + 1] + t3 * r[:, 2:wh + 2]
        u = jnp.stack([ce, co], axis=2).reshape(tile, w, d.shape[-1])
        out_ref[...] = (dc_ref[...].astype(jnp.float32)
                        + u).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("taps", "interpret", "tile"))
def skip_fanout_bwd_pallas(dc, dys, taps, interpret=False, tile=None):
    """dc + up_blur_T(dys) in one pass (see _skip_fanout_bwd_xla)."""
    bsz, h, w, c = dc.shape
    assert dys.shape == (bsz, h // 2, w // 2, c), (dc.shape, dys.shape)
    assert h % 2 == 0 and w % 2 == 0 and c % _LANES == 0
    tile = tile or max(2, _row_tile(h))  # static; see blur_t_gate_pallas
    assert tile % 2 == 0 and h % tile == 0
    th = tile // 2

    kernel = _make_skip_kernel(taps, tile, h, w)
    # pre-pad (see blur_t_gate_pallas): one zero row/col each side gives the
    # overlapping windows non-negative in-bounds element offsets
    dys_pad = jnp.pad(dys, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        kernel,
        grid=(c // _LANES, bsz, h // tile),
        in_specs=[
            pl.BlockSpec((None, tile, w, _LANES),
                         lambda ci, bi, hi: (bi, hi, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (None, pl.Element(th + 2), pl.Element(w // 2 + 2),
                 pl.Element(_LANES)),
                lambda ci, bi, hi: (bi, hi * th, 0, ci * _LANES),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile, w, _LANES),
                               lambda ci, bi, hi: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), dc.dtype),
        # in-place over dc (same shape/dtype, last consumer) — see
        # blur_t_gate_pallas for why the explicit alias matters here
        input_output_aliases=(
            {} if os.environ.get("VQVAE_TPU_DBWD_NO_ALIAS") == "1"
            else {0: 0}),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dc, dys_pad)
    return out


def _skip_pallas_ok(dc, dys) -> bool:
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    bsz, h, w, c = dc.shape
    return (c % _LANES == 0 and h % 2 == 0 and w % 2 == 0
            and dys.shape == (bsz, h // 2, w // 2, c))


def make_fused_skip_fanout(taps: Sequence[float], impl: str | None = None,
                           interpret: bool = False,
                           separable: bool = False):
    """Build ``fanout(x) -> (x, skip_fir(x))`` whose backward fuses the
    up-dilated blur-transpose with the fan-out cotangent ADD.

    The primal is exactly the block's existing fan-out: ``x`` feeds conv0
    unchanged AND the skip path's down-2 FIR (conv2d_resample's 1x1
    pointwise branch). JAX's autodiff would sum the two branch cotangents
    with a separate full-res elementwise add after transposing the FIR;
    the custom bwd receives both cotangents and does add+transpose in one
    kernel. NOT twice-differentiable (see make_fused_act_blur).
    """
    taps = tuple(float(t) for t in taps)
    f = (np.asarray(taps, np.float32) if separable
         else np.outer(np.asarray(taps, np.float32),
                       np.asarray(taps, np.float32)))

    def _primal(x):
        return x, upfirdn2d(x, f, down=2, padding=(1, 1, 1, 1))

    @jax.custom_vjp
    def fanout(x):
        return _primal(x)

    def _fwd(x):
        return _primal(x), None

    def _bwd(_, cts):
        dc, dys = cts
        eff = _dispatch_impl(impl)
        ok = _skip_pallas_ok(dc, dys) or interpret
        if eff == "pallas" and not ok:
            raise ValueError(
                "impl='pallas' requested but the fused skip-backward kernel "
                f"cannot run here (backend={_backend_name()!r}, "
                f"dc={dc.shape}, dys={dys.shape}; needs a TPU backend, "
                "C%128==0 and even H/W)")
        # the skip kernel composed EXACTLY in the full-D fp32 probe
        # (docs/DIAG_DBWD_r4.txt "fused_skip ONLY": 4.6e-5) but the
        # copy-kernel experiment shows the corruption is a property of the
        # program, not the kernel — quarantine it alongside blur_t_gate
        if eff == "pallas" or (eff == "auto" and ok
                               and (interpret or not _quarantined())):
            return (skip_fanout_bwd_pallas(
                dc, dys, taps, interpret=interpret,
                tile=max(2, _row_tile(dc.shape[1]))),)
        return (_skip_fanout_bwd_xla(dc, dys, taps),)

    fanout.defvjp(_fwd, _bwd)
    return fanout


# ---------------------------------------------------------------------------
# custom_vjp integration point
# ---------------------------------------------------------------------------

def make_fused_act_blur(taps: Sequence[float], alpha: float, gain: float,
                        impl: str | None = None, interpret: bool = False,
                        separable: bool = False):
    """Build ``fused(P0, b0) -> blur(bias_act(P0, b0, lrelu))`` whose
    backward is the fused kernel.

    The primal is the exact existing forward (ops/bias_act.py +
    ops/upfirdn2d.py with padding=(2,2,2,2) — the conv2d_resample down=2
    pre-filter for a 3x3 conv); only the VJP changes. NOT twice-
    differentiable — callers needing 2nd-order AD (R1) must use the plain
    path.
    """
    taps = tuple(float(t) for t in taps)
    # honor the VQVAE_TPU_SEPARABLE_FIR forward-lowering A/B inside the
    # fused span too (1-D taps -> two depthwise passes); the backward kernel
    # is always separable
    f = (np.asarray(taps, np.float32) if separable
         else np.outer(np.asarray(taps, np.float32),
                       np.asarray(taps, np.float32)))
    alpha = float(alpha)
    gain = float(gain)

    def _primal(p0, b0):
        a = p0 + b0.astype(p0.dtype)
        a = jnp.where(a >= 0, a, alpha * a) * gain     # lrelu ⋅ gain
        return upfirdn2d(a, f, padding=(2, 2, 2, 2))

    @jax.custom_vjp
    def fused(p0, b0):
        return _primal(p0, b0)

    def _fwd(p0, b0):
        return _primal(p0, b0), (p0, b0)

    def _bwd(res, dy):
        p0, b0 = res
        return blur_t_gate(dy, p0, b0, taps, alpha, gain,
                           impl=impl, interpret=interpret)

    fused.defvjp(_fwd, _bwd)
    return fused
