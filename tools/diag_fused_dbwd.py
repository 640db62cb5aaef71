"""Diagnose the fused-D-backward full-model bf16 divergence (VALIDATE_r4).

validate_tpu's composed probe (fused Discriminator grads == plain, bf16)
failed on silicon at worst rel err ~0.2 while every kernel-level probe
passed. Two hypotheses:

  (a) REAL kernel bug in composition — e.g. small-resolution blocks
      (the res-32 D runs blocks at H=W 32/16/8; the kernel acceptance only
      probed 64x32), or in-place aliasing corruption under the fused
      forward+backward program.
  (b) HONEST bf16 path-noise: the plain path's autodiff blur-transpose runs
      in bf16 (cotangents cast at every op) while the kernel keeps fp32
      through the FIR+gate; per-element ~2e-3 differences then amplify
      through the remaining blocks' conv transposes. Neither path is
      "right" — both are bf16 approximations of the fp32 gradient.

Discriminates with:
  1. kernel-vs-oracle probes at every REAL block shape of the res-32 and
     res-256 discriminators (incl. H=8, C=128);
  2. full-D fused-vs-plain in FP32 (kernel correct => tight match; ~0.2
     here would be a genuine composition bug);
  3. a 3-way bf16 comparison against the fp32-plain truth, per leaf:
     if |fused_bf16 - truth| <= ~2x |plain_bf16 - truth| the kernel adds no
     error beyond the plain path's own bf16 noise — the acceptance criterion
     validate_tpu should actually be checking (the reference's CUDA grad
     kernels are held to the same standard vs their torch autograd oracle,
     not to bit-parity between two half-precision paths).

Run on the real chip (about a minute warm):  python tools/diag_fused_dbwd.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def kernel_probes(rs):
    """Pallas kernel vs XLA oracle at the real D block shapes."""
    from vqvae_tpu.ops.fused_dbwd import (
        _blur_t_gate_xla, _skip_fanout_bwd_xla, blur_t_gate_pallas,
        skip_fanout_bwd_pallas)

    taps = tuple(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)
    alpha, gain = 0.2, float(np.sqrt(2.0))
    # (H, C) for every block of the res-256 flagship D and the res-32 probe D
    shapes = [(256, 128), (128, 256), (64, 512), (32, 512), (16, 512),
              (8, 512)]
    print("== kernel-level probes at real block shapes ==")
    for h, c in shapes:
        b = 2 if h >= 128 else 4
        for dtype in (jnp.float32, jnp.bfloat16):
            dy = jnp.asarray(rs.randn(b, h + 1, h + 1, c), dtype)
            p0 = jnp.asarray(rs.randn(b, h, h, c), dtype)
            b0 = jnp.asarray(rs.randn(c), jnp.float32)
            dp_k, db_k = blur_t_gate_pallas(dy, p0, b0, taps, alpha, gain)
            dp_r, db_r = jax.jit(lambda a, x, y: _blur_t_gate_xla(
                a, x, y, taps, alpha, gain))(dy, p0, b0)
            dp_err = float(jnp.max(jnp.abs(dp_k.astype(jnp.float32)
                                           - dp_r.astype(jnp.float32))))
            db_err = float(jnp.max(jnp.abs(db_k - db_r))
                           / (jnp.max(jnp.abs(db_r)) + 1e-6))
            # skip kernel at the same block: dc at (h, c), dys at (h/2, c)
            dc = jnp.asarray(rs.randn(b, h, h, c), dtype)
            dys = jnp.asarray(rs.randn(b, h // 2, h // 2, c), dtype)
            o_k = skip_fanout_bwd_pallas(dc, dys, taps)
            o_r = jax.jit(lambda a, x: _skip_fanout_bwd_xla(a, x, taps))(
                dc, dys)
            sk_err = float(jnp.max(jnp.abs(o_k.astype(jnp.float32)
                                           - o_r.astype(jnp.float32))))
            print(f"  H={h:3d} C={c:3d} {jnp.dtype(dtype).name:8s} "
                  f"dp={dp_err:.2e} db(rel)={db_err:.2e} skip={sk_err:.2e}")


def _grads(disc, params, x):
    def loss(d):
        return jnp.sum(jnp.tanh(disc.apply({"params": d}, x)
                                .astype(jnp.float32)))
    return jax.jit(jax.grad(loss))(params)


def _loss_and_grads(disc, params, x):
    """value_and_grad: the VALUE is the corruption probe — the primal is
    identical math in fused and plain modules (pinned by
    test_discriminator_fused_forward_identical), so any on-chip divergence
    of the LOSS when the backward kernel runs means the kernel's DMAs are
    clobbering live forward buffers (OOB write / aliasing), not computing
    its own output wrong."""
    def loss(d):
        return jnp.sum(jnp.tanh(disc.apply({"params": d}, x)
                                .astype(jnp.float32)))
    return jax.jit(jax.value_and_grad(loss))(params)


def _leaf_report(name, g, ref, topk=6):
    """Per-leaf max-abs error vs ref, normalized by the leaf's max |ref|."""
    rows = []
    flat, _ = jax.tree_util.tree_flatten_with_path(ref)
    for (path, r), a in zip(flat, jax.tree.leaves(g)):
        r32 = np.asarray(r, np.float32)
        a32 = np.asarray(a, np.float32)
        scale = float(np.max(np.abs(r32))) + 1e-6
        rows.append((float(np.max(np.abs(a32 - r32))) / scale,
                     jax.tree_util.keystr(path), scale))
    rows.sort(reverse=True)
    worst = rows[0][0]
    print(f"== {name}: worst rel err {worst:.3e} ==")
    for err, path, scale in rows[:topk]:
        print(f"  {err:.3e}  (leaf max {scale:.2e})  {path}")
    return worst, dict((p, e) for e, p, _ in rows)


def full_d(rs):
    from vqvae_tpu.models.discriminator import Discriminator

    x = jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32)

    disc32 = Discriminator(img_resolution=32, dtype=jnp.float32)
    params = disc32.init(jax.random.PRNGKey(0), x)["params"]

    # fp32 plain = ground truth for the bf16 comparisons
    loss_plain, truth = _loss_and_grads(disc32, params, x)

    # 0. primal-corruption probe: identical math, so the VALUES must agree
    # to float determinism; divergence => the backward kernel clobbers live
    # forward buffers (see _loss_and_grads docstring)
    fused32 = disc32.clone(fused_dbwd=True, fused_skip=True)
    loss_fused, g_fused32 = _loss_and_grads(fused32, params, x)
    dv = abs(float(loss_fused) - float(loss_plain)) / (
        abs(float(loss_plain)) + 1e-9)
    print(f"== primal loss: plain {float(loss_plain):.8f} "
          f"fused {float(loss_fused):.8f} rel diff {dv:.3e} "
          f"({'PRIMAL CORRUPTED by backward kernel' if dv > 1e-6 else 'primal intact'}) ==")

    # 1. fp32 fused vs fp32 plain: composition correctness of the kernels
    w_f32, _ = _leaf_report("FP32 fused vs FP32 plain (kernel correctness)",
                            g_fused32, truth)

    # attribution runs if fp32 already diverges
    if w_f32 > 1e-4:
        _leaf_report("FP32 fused_dbwd ONLY vs plain",
                     _grads(disc32.clone(fused_dbwd=True), params, x), truth)
        _leaf_report("FP32 fused_skip ONLY vs plain",
                     _grads(disc32.clone(fused_skip=True), params, x), truth)

    # 2. bf16: both paths vs the fp32 truth
    disc16 = Discriminator(img_resolution=32, dtype=jnp.bfloat16)
    fused16 = disc16.clone(fused_dbwd=True, fused_skip=True)
    w_plain, plain_by_leaf = _leaf_report(
        "BF16 plain vs FP32 truth (the plain path's own bf16 noise)",
        _grads(disc16, params, x), truth)
    w_fused, fused_by_leaf = _leaf_report(
        "BF16 fused vs FP32 truth", _grads(fused16, params, x), truth)

    # 3. the validate_tpu comparison, per-leaf, for reference
    _leaf_report("BF16 fused vs BF16 plain (validate_tpu's failing probe)",
                 _grads(fused16, params, x), _grads(disc16, params, x))

    print("\n== verdict ==")
    print(f"fp32 fused-vs-plain worst: {w_f32:.3e} "
          f"({'KERNEL BUG in composition' if w_f32 > 1e-4 else 'kernels exact in composition'})")
    print(f"bf16 plain-vs-truth worst: {w_plain:.3e}")
    print(f"bf16 fused-vs-truth worst: {w_fused:.3e}")
    if w_f32 <= 1e-4:
        ratio = w_fused / max(w_plain, 1e-12)
        print(f"fused/plain bf16-noise ratio: {ratio:.2f} "
              f"({'fused adds NO error beyond bf16 path-noise' if ratio < 2.0 else 'fused amplifies bf16 noise — investigate'})")
        # leaves where fused noise is much worse than plain noise
        bad = [(fused_by_leaf[p] / max(e, 1e-12), p)
               for p, e in plain_by_leaf.items()
               if fused_by_leaf[p] > 3 * max(e, 1e-9)
               and fused_by_leaf[p] > 1e-3]
        for r, p in sorted(bad, reverse=True)[:6]:
            print(f"  fused {r:.1f}x noisier: {p}")


def main():
    print(f"backend: {jax.default_backend()}, "
          f"device: {jax.devices()[0].device_kind}")
    print(f"VQVAE_TPU_DBWD_NO_ALIAS={os.environ.get('VQVAE_TPU_DBWD_NO_ALIAS', '')}")
    rs = np.random.RandomState(0)
    # --composed-only: just the full-D composition legs (used by the
    # no-alias discrimination run — the alias env is baked in at trace time,
    # so that leg needs its own process)
    if "--composed-only" not in sys.argv:
        kernel_probes(rs)
    full_d(rs)


if __name__ == "__main__":
    main()
