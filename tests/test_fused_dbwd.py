"""Fused D-backward (blur-transpose ⊙ lrelu-gate + bias-grad) parity.

Pins ops/fused_dbwd.py three ways:

1. the Pallas kernel (interpret mode) against the XLA oracle across shapes,
   dtypes, and tile/halo boundary cases;
2. the ``fused_act_blur`` custom_vjp against plain JAX autodiff of the same
   bias_act→blur chain (the exact conv2d_resample down=2 pre-filter);
3. the full Discriminator with ``fused_dbwd=True`` against the plain module:
   identical forward, matching parameter/input gradients — and the R1
   restriction (custom_vjp is not twice-differentiable) that steps.py
   respects by keeping the plain module in the R1 linearization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.models.discriminator import Discriminator
from vqvae_tpu.ops.fused_dbwd import (
    _blur_t_gate_xla, blur_t_gate, blur_t_gate_pallas, make_fused_act_blur)
from vqvae_tpu.ops.upfirdn2d import upfirdn2d

TAPS = tuple(np.array([1.0, 3.0, 3.0, 1.0]) / 8.0)
ALPHA, GAIN = 0.2, float(np.sqrt(2.0))


def _rand(rs, shape, dtype):
    return jnp.asarray(rs.randn(*shape), dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((2, 16, 16, 128), jnp.float32),   # single h-tile
    ((1, 64, 24, 128), jnp.float32),   # multiple h-tiles, odd W
    ((2, 8, 8, 256), jnp.float32),     # small tile + two channel tiles
    ((2, 32, 16, 128), jnp.bfloat16),  # training dtype
])
def test_kernel_matches_oracle(shape, dtype):
    b, h, w, c = shape
    rs = np.random.RandomState(0)
    dy = _rand(rs, (b, h + 1, w + 1, c), dtype)
    p0 = _rand(rs, (b, h, w, c), dtype)
    b0 = _rand(rs, (c,), jnp.float32)

    dp_ref, db_ref = _blur_t_gate_xla(dy, p0, b0, TAPS, ALPHA, GAIN)
    dp_k, db_k = blur_t_gate_pallas(dy, p0, b0, TAPS, ALPHA, GAIN,
                                    interpret=True)
    assert dp_k.dtype == p0.dtype and db_k.dtype == b0.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(dp_k, np.float32),
                               np.asarray(dp_ref, np.float32),
                               rtol=tol, atol=tol)
    if dtype == jnp.float32:
        np.testing.assert_allclose(db_k, db_ref, rtol=5e-5, atol=1e-3)
    else:
        # the kernel accumulates UNROUNDED f32 products; the oracle sums the
        # bf16-rounded blur output — near-cancelling sums differ by O(sqrt(N)
        # * bf16_eps * |terms|), so compare against the term scale
        scale = float(jnp.sum(jnp.abs(dp_ref.astype(jnp.float32)),
                              axis=(0, 1, 2)).max())
        np.testing.assert_allclose(db_k, db_ref, rtol=2e-2,
                                   atol=2e-3 * scale ** 0.5 + 1e-3)


def test_custom_vjp_matches_autodiff():
    rs = np.random.RandomState(1)
    b, h, w, c = 2, 16, 16, 128
    p0 = _rand(rs, (b, h, w, c), jnp.float32)
    b0 = _rand(rs, (c,), jnp.float32)
    ct = _rand(rs, (b, h + 1, w + 1, c), jnp.float32)
    f2d = np.outer(TAPS, TAPS)

    def plain(p, bb):
        a = jax.nn.leaky_relu(p + bb, ALPHA) * GAIN
        return upfirdn2d(a, f2d, padding=(2, 2, 2, 2))

    # interpret=True forces the Pallas kernel (not the oracle) in the VJP,
    # covering the integration end-to-end through the actual kernel
    fused = make_fused_act_blur(TAPS, ALPHA, GAIN, interpret=True)
    np.testing.assert_array_equal(fused(p0, b0), plain(p0, b0))

    g_f = jax.grad(lambda p, bb: jnp.vdot(fused(p, bb), ct),
                   argnums=(0, 1))(p0, b0)
    g_p = jax.grad(lambda p, bb: jnp.vdot(plain(p, bb), ct),
                   argnums=(0, 1))(p0, b0)
    np.testing.assert_allclose(g_f[0], g_p[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g_f[1], g_p[1], rtol=1e-5, atol=1e-4)


def test_explicit_pallas_request_fails_descriptively():
    rs = np.random.RandomState(2)
    dy = _rand(rs, (1, 9, 9, 64), jnp.float32)   # C=64: not lane-aligned
    p0 = _rand(rs, (1, 8, 8, 64), jnp.float32)
    b0 = _rand(rs, (64,), jnp.float32)
    with pytest.raises(ValueError, match="fused D-backward"):
        blur_t_gate(dy, p0, b0, TAPS, ALPHA, GAIN, impl="pallas")
    # 'auto' falls back to the oracle silently
    dp, db = blur_t_gate(dy, p0, b0, TAPS, ALPHA, GAIN, impl="auto")
    dp_ref, db_ref = _blur_t_gate_xla(dy, p0, b0, TAPS, ALPHA, GAIN)
    np.testing.assert_array_equal(dp, dp_ref)


@pytest.fixture(scope="module")
def disc_pair():
    disc = Discriminator(img_resolution=16, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.RandomState(3).rand(4, 16, 16, 3).astype(np.float32))
    dp = disc.init(jax.random.PRNGKey(0), x)["params"]
    return disc, disc.clone(fused_dbwd=True), dp, x


def test_discriminator_fused_forward_identical(disc_pair):
    disc, disc_f, dp, x = disc_pair
    # same param tree: clone() must not change structure or shapes
    dp_f = disc_f.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree.structure(dp) == jax.tree.structure(dp_f))
    np.testing.assert_array_equal(disc.apply({"params": dp}, x),
                                  disc_f.apply({"params": dp}, x))


def test_discriminator_fused_grads_match(disc_pair):
    disc, disc_f, dp, x = disc_pair

    def loss(module, d, im):
        return jnp.sum(jnp.tanh(module.apply({"params": d}, im)))

    gd, gx = jax.grad(lambda d, im: loss(disc, d, im), argnums=(0, 1))(dp, x)
    gd_f, gx_f = jax.grad(lambda d, im: loss(disc_f, d, im),
                          argnums=(0, 1))(dp, x)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gd),
            jax.tree_util.tree_leaves_with_path(gd_f)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))
    np.testing.assert_allclose(gx, gx_f, rtol=2e-5, atol=1e-6)


def test_fused_op_rejects_second_order(disc_pair):
    """Documents the R1 restriction steps.py honors: once the backward is the
    actual Pallas kernel (as on TPU), the chain cannot be linearized twice —
    pallas_call has no AD rules — so the R1 step's D-at-images vjp must use
    the plain module. (On CPU the module's 'auto' dispatch falls back to the
    jnp oracle backward, which happens to be differentiable; the TPU path is
    what this pins, via the interpret-mode kernel.)"""
    disc, _, dp, x = disc_pair
    rs = np.random.RandomState(4)
    p0 = _rand(rs, (1, 8, 8, 128), jnp.float32)
    b0 = _rand(rs, (128,), jnp.float32)
    fused = make_fused_act_blur(TAPS, ALPHA, GAIN, interpret=True)

    def r1_like(p):
        y, vjp = jax.vjp(fused, p, b0)
        return jnp.sum(vjp(jnp.ones_like(y))[0] ** 2)

    with pytest.raises(Exception):
        jax.grad(r1_like)(p0)

    # the actual R1 path (plain module) stays twice-differentiable
    def r1_module(d):
        logits, d_vjp = jax.vjp(lambda i: disc.apply({"params": d}, i), x)
        return jnp.sum(d_vjp(jnp.ones_like(logits))[0] ** 2)

    jax.grad(r1_module)(dp)


def test_env_flag_trains_gan_with_r1(tmp_path, monkeypatch):
    """VQVAE_TPU_FUSED_DBWD=1 plumbing smoke: a tiny GAN run with an R1-
    cadence step trains end-to-end (the R1 stage keeps the plain module —
    steps.py disc_1st split — so the run must not hit a custom_vjp
    second-order error) and produces finite losses."""
    from PIL import Image

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.data.dataset import ImageFolderDataset, Loader
    from vqvae_tpu.train.loop import run_training
    from vqvae_tpu.utils.logging import MetricLogger

    img = 16
    monkeypatch.setenv("VQVAE_TPU_FUSED_DBWD", "1")
    monkeypatch.setenv("VQVAE_TPU_FUSED_SKIP", "1")
    # route the fused backwards through the REAL (interpret-mode) Pallas
    # kernels: pins that no twice-linearized path (adaptive-lambda replay,
    # R1 D-at-images) ever reaches them — on TPU that is a trace error
    monkeypatch.setenv("VQVAE_TPU_DBWD_INTERPRET", "1")
    d = tmp_path / "data" / "train"
    d.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(16):
        Image.fromarray(rs.randint(0, 255, (img, img, 3), np.uint8)).save(
            d / f"i{i:02d}.png")

    cfg = parse_config({
        "image_size": img,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "loss": {"l1_weight": 1.0, "l2_weight": 1.0, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 0,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1,
                                        "use_adaptive": True,
                                        "r1_reg_weight": 10.0,
                                        "r1_reg_every": 2}},
        "training": {"cumulative_bs": 16, "base_lr": 1e-3,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })
    loader = Loader(ImageFolderDataset(str(d), img), batch_size=16,
                    shuffle=True, drop_last=True, seed=0)
    logger = MetricLogger(str(tmp_path), "fused")
    state, _ = run_training(cfg, loader, None, seed=0, learning_rate=1e-3,
                            save_dir=str(tmp_path), run_name="fused",
                            logger=logger, max_epochs=2, check_val_every=100)
    logger.finish()
    assert int(state.step) == 2  # 1 step/epoch; step 2 ran the R1 stage
    import json
    rows = [json.loads(l)
            for l in open(tmp_path / "fused" / "metrics.jsonl")]
    rows = [r for r in rows if "train/loss" in r]
    assert rows and all(np.isfinite(r["train/loss"]) for r in rows)
    assert any(r.get("train/r1_penalty", 0) > 0 for r in rows)


# ---------------------------------------------------------------------------
# skip-path fan-out (kernel B): up-dilated blur-transpose + cotangent add
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,dtype", [
    ((2, 16, 16, 128), jnp.float32),
    ((1, 64, 24, 256), jnp.float32),   # multi h-tile, odd half-W, 2 c-tiles
    ((2, 32, 16, 128), jnp.bfloat16),
])
def test_skip_kernel_matches_oracle(shape, dtype):
    from vqvae_tpu.ops.fused_dbwd import (
        _skip_fanout_bwd_xla, skip_fanout_bwd_pallas)
    b, h, w, c = shape
    rs = np.random.RandomState(5)
    dc = _rand(rs, (b, h, w, c), dtype)
    dys = _rand(rs, (b, h // 2, w // 2, c), dtype)
    out_k = skip_fanout_bwd_pallas(dc, dys, TAPS, interpret=True)
    out_r = _skip_fanout_bwd_xla(dc, dys, TAPS)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out_k, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=tol, atol=tol)


def test_skip_fanout_vjp_matches_autodiff():
    from vqvae_tpu.ops.fused_dbwd import make_fused_skip_fanout
    rs = np.random.RandomState(6)
    x = _rand(rs, (2, 16, 16, 128), jnp.float32)
    f2d = np.outer(TAPS, TAPS)

    def plain(x):
        ys = upfirdn2d(x, f2d, down=2, padding=(1, 1, 1, 1))
        return jnp.sum(jnp.tanh(x)) + jnp.sum(ys ** 2)

    fan = make_fused_skip_fanout(TAPS, interpret=True)

    def fused_loss(x):
        xc, ys = fan(x)
        return jnp.sum(jnp.tanh(xc)) + jnp.sum(ys ** 2)

    np.testing.assert_array_equal(fused_loss(x), plain(x))
    g_f = jax.grad(fused_loss)(x)
    g_p = jax.grad(plain)(x)
    np.testing.assert_allclose(g_f, g_p, rtol=1e-5, atol=1e-6)


def test_discriminator_fused_skip_parity(disc_pair):
    disc, _, dp, x = disc_pair
    disc_s = disc.clone(fused_skip=True)
    disc_both = disc.clone(fused_skip=True, fused_dbwd=True)
    np.testing.assert_array_equal(disc.apply({"params": dp}, x),
                                  disc_s.apply({"params": dp}, x))
    np.testing.assert_array_equal(disc.apply({"params": dp}, x),
                                  disc_both.apply({"params": dp}, x))

    def loss(module, d, im):
        return jnp.sum(jnp.tanh(module.apply({"params": d}, im)))

    gd, gx = jax.grad(lambda d, im: loss(disc, d, im), argnums=(0, 1))(dp, x)
    for mod in (disc_s, disc_both):
        gd_f, gx_f = jax.grad(lambda d, im: loss(mod, d, im),
                              argnums=(0, 1))(dp, x)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(gd),
                jax.tree_util.tree_leaves_with_path(gd_f)):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(kp))
        np.testing.assert_allclose(gx, gx_f, rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Mosaic quarantine (round 4, docs/DIAG_DBWD_r4.txt): on compiled TPU
# backends 'auto' must route the custom_vjp backward to the XLA oracle —
# the stack corrupts composed programs around Mosaic custom-calls in this
# position — unless VQVAE_TPU_DBWD_UNSAFE=1.

def test_quarantine_dispatch(monkeypatch):
    import vqvae_tpu.ops.fused_dbwd as fd

    calls = []
    monkeypatch.setattr(fd, "blur_t_gate_pallas",
                        lambda *a, **k: calls.append("pallas") or ("P", "P"))
    monkeypatch.setattr(fd, "_blur_t_gate_xla",
                        lambda *a, **k: calls.append("xla") or ("X", "X"))
    # pretend we are on a compiled TPU backend with kernel-able shapes
    monkeypatch.setattr(fd, "_pallas_ok", lambda dy, p0: True)
    monkeypatch.setattr(fd, "_warned_quarantine", False)

    rs = np.random.RandomState(0)
    dy = _rand(rs, (1, 9, 9, 128), jnp.float32)
    p0 = _rand(rs, (1, 8, 8, 128), jnp.float32)
    b0 = _rand(rs, (128,), jnp.float32)

    # default: quarantined -> oracle, with the one-time warning
    monkeypatch.delenv("VQVAE_TPU_DBWD_UNSAFE", raising=False)
    with pytest.warns(UserWarning, match="quarantined"):
        blur_t_gate(dy, p0, b0, TAPS, ALPHA, GAIN, impl="auto")
    assert calls == ["xla"]

    # override restores the compiled kernel
    calls.clear()
    monkeypatch.setenv("VQVAE_TPU_DBWD_UNSAFE", "1")
    blur_t_gate(dy, p0, b0, TAPS, ALPHA, GAIN, impl="auto")
    assert calls == ["pallas"]

    # interpret mode was never quarantined (no Mosaic involved)
    calls.clear()
    monkeypatch.delenv("VQVAE_TPU_DBWD_UNSAFE", raising=False)
    blur_t_gate(dy, p0, b0, TAPS, ALPHA, GAIN, impl="auto", interpret=True)
    assert calls == ["pallas"]
