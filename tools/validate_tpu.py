"""Hardware acceptance checks: run the numeric-critical kernels on the real
TPU chip and compare against their oracles / reference formulas.

The CPU test suite (tests/, 8 virtual devices, interpret-mode Pallas) cannot
observe TPU-only behavior — MXU accumulation precision, Mosaic lowering,
layout-dependent fusions. This script is the complement: small, fast probes
on the actual chip. Run after kernel/ops changes:

    python tools/validate_tpu.py

Checks:
  1. Pallas VQ nearest-neighbor == fp32-pinned XLA oracle (exact).
  2. Folded nearest-x2 upsample conv == materialize-then-conv reference.
  3. upfirdn2d adjoint: <f(x), y> == <x, f^T(y)> (VJP is the true transpose).
  4. GroupNorm (unbiased, fp32 stats) == numpy reference formula.
  5. bias_act activation table == jnp reference formulas.
  6. Fused D-backward Pallas kernel (blur-transpose ⊙ lrelu-gate + bias-grad,
     element-window halos) == XLA oracle STANDALONE; composed, the fused
     Discriminator's full parameter gradient must match the plain module's —
     which, while the Mosaic-custom-call quarantine is active
     (ops/fused_dbwd.py, docs/DIAG_DBWD_r4.txt), validates the quarantine
     contract (the custom_vjp routes to its XLA oracle). fp32 must match
     EXACTLY; bf16 within ~2x the plain path's own distance from the fp32
     truth (two independently-rounded bf16 paths do not bit-agree; see
     tools/diag_fused_dbwd.py).
  7. VQ kernels in a COMPOSED program (conv -> VQ -> STE loss -> grad, and
     the fused stats variant) == the same program on the XLA impl — guards
     against the class of stack bug found in round 4 where a correct Pallas
     kernel corrupts the surrounding compiled program.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name}{(' — ' + detail) if detail else ''}")
    return bool(ok)


def validate_vq_pallas(rs):
    from vqvae_tpu.ops.vq_pallas import nearest_codes_pallas
    from vqvae_tpu.ops.vq import _nearest_codes_xla

    x = jnp.asarray(rs.randn(4096, 256), jnp.float32)
    cb = jnp.asarray(rs.randn(1024, 256), jnp.float32)
    cp = np.asarray(jax.jit(nearest_codes_pallas)(x, cb))
    cr = np.asarray(jax.jit(_nearest_codes_xla)(x, cb))
    n_bad = int((cp != cr).sum())
    return check("pallas VQ == XLA oracle", n_bad == 0, f"{n_bad} mismatches")


def validate_vq_stats_pallas(rs):
    from vqvae_tpu.ops.vq_pallas import nearest_codes_stats_pallas
    from vqvae_tpu.ops.vq import _nearest_codes_stats_xla

    x = jnp.asarray(rs.randn(4096, 256), jnp.float32)
    cb = jnp.asarray(rs.randn(1024, 256), jnp.float32)
    cp, np_, dwp = jax.jit(nearest_codes_stats_pallas)(x, cb)
    cr, nr, dwr = jax.jit(_nearest_codes_stats_xla)(x, cb)
    codes_ok = bool((np.asarray(cp) == np.asarray(cr)).all())
    counts_ok = bool((np.asarray(np_) == np.asarray(nr)).all())
    dw_err = float(jnp.max(jnp.abs(dwp - dwr)))
    return check("pallas VQ+stats == XLA oracle",
                 codes_ok and counts_ok and dw_err < 1e-3,
                 f"codes {codes_ok}, counts {counts_ok}, dw err {dw_err:.2e}")


def validate_vq_composed(rs):
    """COMPOSED-program acceptance for the VQ kernel.

    The round-4 Mosaic finding (docs/DIAG_DBWD_r4.txt): on this stack a
    Pallas custom-call can corrupt the SURROUNDING compiled program even
    when the kernel is oracle-exact standalone (a trivially-correct copy
    kernel reproduced the fused-D divergence). The VQ kernel runs inside
    real EMA/standard train steps, so its acceptance must cover the composed
    context too: upstream conv -> kernel -> STE loss -> grad, Pallas vs XLA
    impl of the SAME program."""
    from vqvae_tpu.ops.vq import nearest_codes, nearest_codes_stats

    d, n = 128, 256
    x = jnp.asarray(rs.rand(4, 16, 16, 32), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, 32, d) * 0.05, jnp.float32)
    cb = jnp.asarray(rs.randn(n, d), jnp.float32)

    def step(w_, impl):
        z = jax.lax.conv_general_dilated(
            x, w_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        flat = z.reshape(-1, d)  # M = 4*16*16 = 1024 (kernel-aligned)
        codes = nearest_codes(flat, cb, impl=impl)
        q = cb[codes]
        q_ste = flat + jax.lax.stop_gradient(q - flat)
        commit = jnp.sum((flat - jax.lax.stop_gradient(q)) ** 2)
        return jnp.sum(jnp.tanh(q_ste)) + 0.25 * commit

    ok = True
    v_p, g_p = jax.jit(jax.value_and_grad(
        lambda w_: step(w_, "pallas")))(w)
    v_x, g_x = jax.jit(jax.value_and_grad(
        lambda w_: step(w_, "xla")))(w)
    dv = abs(float(v_p) - float(v_x)) / (abs(float(v_x)) + 1e-9)
    dg = float(jnp.max(jnp.abs(g_p - g_x))) / (
        float(jnp.max(jnp.abs(g_x))) + 1e-9)
    ok = check("VQ kernel composed (conv->VQ->STE loss->grad) == XLA",
               dv < 1e-6 and dg < 1e-5,
               f"loss rel {dv:.2e}, grad rel {dg:.2e}") and ok

    # fused stats kernel in the same composed position
    def stats(w_, impl):
        z = jax.lax.conv_general_dilated(
            x, w_, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return nearest_codes_stats(z.reshape(-1, d), cb, impl=impl)

    c_p, n_p, dw_p = jax.jit(lambda w_: stats(w_, "pallas"))(w)
    c_x, n_x, dw_x = jax.jit(lambda w_: stats(w_, "xla"))(w)
    bad = int((np.asarray(c_p) != np.asarray(c_x)).sum())
    dcnt = float(jnp.max(jnp.abs(n_p - n_x)))
    ddw = float(jnp.max(jnp.abs(dw_p - dw_x))) / (
        float(jnp.max(jnp.abs(dw_x))) + 1e-9)
    ok = check("VQ stats kernel composed == XLA",
               bad == 0 and dcnt == 0.0 and ddw < 1e-6,
               f"{bad} code mismatches, dcounts {dcnt}, dw rel {ddw:.2e}"
               ) and ok
    return ok


def validate_folded_upsample(rs):
    from vqvae_tpu.models.autoencoder import Upsample

    x = jnp.asarray(rs.randn(2, 16, 16, 32), jnp.float32)
    mod = Upsample(channels=32, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)

    # pin to HIGHEST so the check sees the fold transform, not the TPU's
    # default one-pass bf16 MXU accumulation (both sides would differ at
    # bf16 eps otherwise — that is the normal training compute policy)
    with jax.default_matmul_precision("highest"):
        y = jax.jit(lambda p, x: mod.apply(p, x))(params, x)
        w = params["params"]["conv"]["Conv_0"]["kernel"]
        b = params["params"]["conv"]["Conv_0"]["bias"]
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        ref = jax.lax.conv_general_dilated(
            up, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        err = float(jnp.max(jnp.abs(y - ref)))
    return check("folded upsample == replicate+conv", err < 1e-4, f"max err {err:.2e}")


def validate_upfirdn_adjoint(rs):
    from vqvae_tpu.ops.upfirdn2d import setup_filter, upfirdn2d

    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(rs.randn(2, 16, 16, 8), jnp.float32)

    def fwd(x):
        return upfirdn2d(x, f, down=2, padding=1)

    y_shape = jax.eval_shape(fwd, x)
    y = jnp.asarray(rs.randn(*y_shape.shape), jnp.float32)
    fx, vjp = jax.vjp(fwd, x)
    fty = vjp(y)[0]
    lhs = float(jnp.vdot(fx, y))
    rhs = float(jnp.vdot(x, fty))
    return check("upfirdn2d adjoint identity", abs(lhs - rhs) < 1e-3 * max(1, abs(lhs)),
                 f"<f(x),y>={lhs:.6f} <x,fT(y)>={rhs:.6f}")


def validate_groupnorm(rs):
    from vqvae_tpu.models.autoencoder import GroupNorm

    x = np.asarray(rs.randn(2, 8, 8, 64), np.float32)
    mod = GroupNorm(num_groups=32, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(jax.jit(lambda p, x: mod.apply(p, x))(params, jnp.asarray(x)))

    xg = x.reshape(2, 8, 8, 32, 2)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).sum(axis=(1, 2, 4), keepdims=True) / (8 * 8 * 2 - 1)
    ref = ((xg - mean) / np.sqrt(var + 1e-6)).reshape(x.shape)
    err = float(np.max(np.abs(y - ref)))
    return check("GroupNorm (unbiased, fp32 stats)", err < 1e-4, f"max err {err:.2e}")


def validate_bias_act(rs):
    from vqvae_tpu.ops.bias_act import activation_funcs, bias_act

    x = jnp.asarray(rs.randn(64, 32), jnp.float32)
    b = jnp.asarray(rs.randn(32), jnp.float32)
    ok = True
    for name, spec in activation_funcs.items():
        y = jax.jit(lambda x, b, n=name: bias_act(x, b, act=n))(x, b)
        ref = spec.fn(x + b[None, :], spec.def_alpha) * spec.def_gain
        err = float(jnp.max(jnp.abs(y - ref)))
        if err > 1e-4:
            ok = check(f"bias_act[{name}]", False, f"max err {err:.2e}")
    return check("bias_act activation table", ok)


def validate_fused_dbwd(rs):
    from vqvae_tpu.ops.fused_dbwd import _blur_t_gate_xla, blur_t_gate_pallas

    taps = tuple(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)
    alpha, gain = 0.2, float(np.sqrt(2.0))
    ok = True
    # fp32 (exactness) and bf16 (training dtype) at a multi-tile shape; the
    # element-window halo path is what CPU interpret mode cannot lower-check
    # db tol: fp32 differs only by f32 accumulation ORDER (tight); bf16 by
    # the oracle's extra bf16 rounding of the blur output (loose)
    for dtype, tol, db_tol in ((jnp.float32, 5e-6, 5e-4),
                               (jnp.bfloat16, 2e-2, 2e-2)):
        dy = jnp.asarray(rs.randn(2, 65, 33, 256), dtype)
        p0 = jnp.asarray(rs.randn(2, 64, 32, 256), dtype)
        b0 = jnp.asarray(rs.randn(256), jnp.float32)
        dp_k, db_k = blur_t_gate_pallas(dy, p0, b0, taps, alpha, gain)
        dp_r, db_r = jax.jit(
            lambda a, b, c: _blur_t_gate_xla(a, b, c, taps, alpha, gain))(
                dy, p0, b0)
        dp_err = float(jnp.max(jnp.abs(dp_k.astype(jnp.float32)
                                       - dp_r.astype(jnp.float32))))
        db_err = float(jnp.max(jnp.abs(db_k - db_r)))
        db_scale = float(jnp.max(jnp.abs(db_r))) + 1.0
        ok = check(f"fused D-bwd kernel [{jnp.dtype(dtype).name}]",
                   dp_err < tol and db_err < db_tol * db_scale,
                   f"dp err {dp_err:.2e}, db err {db_err:.2e}") and ok

    # skip-path kernel: up-dilated blur-transpose + cotangent add
    from vqvae_tpu.ops.fused_dbwd import (
        _skip_fanout_bwd_xla, skip_fanout_bwd_pallas)
    for dtype, tol in ((jnp.float32, 5e-6), (jnp.bfloat16, 2e-2)):
        dc = jnp.asarray(rs.randn(2, 64, 32, 256), dtype)
        dys = jnp.asarray(rs.randn(2, 32, 16, 256), dtype)
        o_k = skip_fanout_bwd_pallas(dc, dys, taps)
        o_r = jax.jit(lambda a, b: _skip_fanout_bwd_xla(a, b, taps))(dc, dys)
        err = float(jnp.max(jnp.abs(o_k.astype(jnp.float32)
                                    - o_r.astype(jnp.float32))))
        ok = check(f"fused skip-bwd kernel [{jnp.dtype(dtype).name}]",
                   err < tol, f"max err {err:.2e}") and ok

    # Full-D gradient acceptance. While the Mosaic quarantine is active
    # (ops/fused_dbwd.py), the fused module's backward dispatches to the XLA
    # oracle, so these probes pin the quarantine contract: enabling the
    # fused flags must be numerically indistinguishable from the plain
    # module. Two-part criterion (the round-3 probe
    # demanded bit-level parity between TWO bf16 paths — the plain autodiff
    # backward rounds the blur-transpose to bf16 at every op while the kernel
    # carries fp32 through FIR+gate, so their difference AMPLIFIES through
    # the remaining blocks' transposes and is NOT a kernel-correctness
    # signal; tools/diag_fused_dbwd.py attributes it):
    #   (a) fp32 composition exactness: fused == plain when nothing rounds;
    #   (b) bf16 noise: fused must sit no farther from the fp32 truth than
    #       ~2x the plain path's own bf16 distance (the reference holds its
    #       CUDA grad kernels to the same vs-autograd-oracle standard).
    from vqvae_tpu.models.discriminator import Discriminator
    x = jnp.asarray(rs.rand(4, 32, 32, 3), jnp.float32)
    disc32 = Discriminator(img_resolution=32, dtype=jnp.float32)
    dp = disc32.init(jax.random.PRNGKey(0), x)["params"]

    def grads(module):
        def loss(d):
            return jnp.sum(jnp.tanh(module.apply({"params": d}, x)
                                    .astype(jnp.float32)))
        return jax.jit(jax.grad(loss))(dp)

    def worst_rel(g, ref):
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref)):
            scale = float(jnp.max(jnp.abs(b))) + 1e-6
            worst = max(worst,
                        float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                              - b.astype(jnp.float32)))) / scale)
        return worst

    truth = grads(disc32)
    w_f32 = worst_rel(grads(disc32.clone(fused_dbwd=True, fused_skip=True)),
                      truth)
    ok = check("fused Discriminator grads == plain (fp32 composition)",
               w_f32 < 1e-4, f"worst rel err {w_f32:.2e}") and ok

    disc16 = Discriminator(img_resolution=32, dtype=jnp.bfloat16)
    w_plain = worst_rel(grads(disc16), truth)
    w_fused = worst_rel(grads(disc16.clone(fused_dbwd=True, fused_skip=True)),
                        truth)
    ok = check("fused D bf16 grads within plain-path bf16 noise",
               w_fused <= max(2.0 * w_plain, 1e-3),
               f"fused-vs-truth {w_fused:.2e}, plain-vs-truth {w_plain:.2e}"
               ) and ok
    return ok


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0].device_kind}")
    rs = np.random.RandomState(0)
    results = [
        validate_vq_pallas(rs),
        validate_vq_stats_pallas(rs),
        validate_vq_composed(rs),
        validate_folded_upsample(rs),
        validate_upfirdn_adjoint(rs),
        validate_groupnorm(rs),
        validate_bias_act(rs),
        validate_fused_dbwd(rs),
    ]
    if not all(results):
        sys.exit(1)
    print("all TPU validation checks passed")


if __name__ == "__main__":
    main()
