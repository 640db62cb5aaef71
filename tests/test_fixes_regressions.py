"""Regressions for training-correctness fixes (round-1 self-review):

1. Discriminator LR schedule must follow the GLOBAL step, not the D
   optimizer's own update count (which starts at 0 at adversarial
   start_epoch). Reference drives both optimizers from current_step
   (model.py:202-230).
2. EMA dead-code reinit must also rewrite the EMA accumulators — rewriting
   only the codebook is a silent no-op because the next train step
   recomputes codebook = ema_weight / ema_count (the reference has this
   exact no-op, vector_quantizers.py:169 + base_quantizer.py:96-102).
3. Masked eval metrics: zero-padded rows of a partial final batch must not
   pollute l1/l2/perceptual/GAN metrics (only quant_loss stays unmasked,
   documented); an all-zero usage histogram must not NaN perplexity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.config import parse_config
from vqvae_tpu.models.quantizers import (
    get_codebook_usage, reinit_unused_codes_ema)
from vqvae_tpu.train.loop import Trainer


def _mse_cfg(**training_extra):
    return parse_config({
        "image_size": 16,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"type": "standard", "num_embeddings": 32,
                      "embedding_dim": 8, "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4, "betas": [0.0, 0.99],
                     "eps": 1e-8, "weight_decay": 1e-4, "decay_epochs": 2,
                     "max_epochs": 3, **training_extra},
    })


def test_disc_lr_schedule_offset_by_start_epoch():
    raw = {
        "image_size": 16,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"type": "standard", "num_embeddings": 32,
                      "embedding_dim": 8, "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "loss": {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 3,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1,
                                        "use_adaptive": False,
                                        "r1_reg_weight": None,
                                        "r1_reg_every": 16}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4, "betas": [0.0, 0.99],
                     "eps": 1e-8, "weight_decay": 1e-4, "decay_epochs": 10,
                     "max_epochs": 12},
    }
    cfg = parse_config(raw)
    tr = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=50,
                 mesh=None, compute_dtype=jnp.float32, remat=False)
    # D's first update happens at global step start_epoch*steps_per_epoch:
    # its count-0 LR must equal the global schedule there, not step 0's
    offset = 3 * 50
    np.testing.assert_allclose(float(tr.disc_lr_sched(0)),
                               float(tr.lr_sched(offset)), rtol=1e-6)
    np.testing.assert_allclose(float(tr.disc_lr_sched(70)),
                               float(tr.lr_sched(offset + 70)), rtol=1e-6)


def test_ema_reinit_survives_training_step():
    """Dead rows must stay reinitialized after the next EMA update."""
    rng = jax.random.PRNGKey(0)
    n, d = 8, 4
    codebook = jnp.asarray(np.random.RandomState(0).randn(n, d), jnp.float32)
    ema_count = jnp.ones((n,), jnp.float32)
    ema_weight = codebook * ema_count[:, None]

    usage = jnp.array([5., 3., 0., 0., 2., 1., 0., 4.])
    probs = usage / usage.sum()
    new_cb, new_w, new_c = reinit_unused_codes_ema(
        codebook, ema_weight, ema_count, probs, rng)

    dead = np.array([2, 3, 6])
    live = np.array([0, 1, 4, 5, 7])
    # live rows untouched
    np.testing.assert_array_equal(np.asarray(new_cb)[live],
                                  np.asarray(codebook)[live])
    # dead rows changed, and CONSISTENT with the accumulators: the next
    # training step's codebook = ema_weight/ema_count must preserve them
    assert not np.allclose(np.asarray(new_cb)[dead], np.asarray(codebook)[dead])
    derived = np.asarray(new_w) / np.asarray(new_c)[:, None]
    np.testing.assert_allclose(derived[dead], np.asarray(new_cb)[dead],
                               rtol=1e-6)


def test_eval_metrics_masked_against_padded_rows():
    cfg = _mse_cfg()
    tr = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=4,
                 mesh=None, compute_dtype=jnp.float32, remat=False)
    state = tr.init_state()

    rs = np.random.RandomState(1)
    valid = rs.randint(0, 255, (4, 16, 16, 3), np.uint8)
    padded = np.concatenate([valid, np.zeros_like(valid)], axis=0)
    mask = np.array([True] * 4 + [False] * 4)

    m_full, usage_full, _ = tr.eval_step(
        state, {"image": valid, "mask": np.ones((4,), bool)}, epoch=0)
    m_pad, usage_pad, _ = tr.eval_step(
        state, {"image": padded, "mask": mask}, epoch=0)

    assert float(m_pad["n_valid"]) == 4.0
    for k in ("l1_loss", "l2_loss"):
        np.testing.assert_allclose(float(m_pad[k]), float(m_full[k]),
                                   rtol=1e-4, err_msg=k)
    # quant_loss is the documented unmasked exception (batch scalar from the
    # quantizer); `loss` must match once that component is subtracted
    np.testing.assert_allclose(
        float(m_pad["loss"]) - float(m_pad["quant_loss"]),
        float(m_full["loss"]) - float(m_full["quant_loss"]), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(usage_pad),
                                  np.asarray(usage_full))


def test_zero_usage_histogram_does_not_nan():
    probs, perplexity, used = get_codebook_usage(jnp.zeros((16,), jnp.int32))
    assert np.all(np.isfinite(np.asarray(probs)))
    assert float(perplexity) == pytest.approx(1.0)
    assert float(used) == 0.0


def test_remat_estimate_calibration():
    """Pin the auto-remat memory model to its v5e-measured anchor points
    (PERFORMANCE.md): flagship 256^2 b32 GAN fits without remat, b48/b64 do
    not, and grad accumulation gates on the micro-batch."""
    from vqvae_tpu.train.loop import estimate_activation_gb
    raw = {
        "image_size": 256,
        "autoencoder": {"channels": 128, "num_res_blocks": 2,
                        "channel_multipliers": [1, 2, 2, 4]},
        "quantizer": {"type": "gumbel", "num_embeddings": 1024,
                      "embedding_dim": 256, "reinit_every_n_epochs": None,
                      "params": {"straight_through": False, "temp": 1.0,
                                 "kl_cost": 0.01, "kl_warmup_epochs": 0.5,
                                 "temp_decay_epochs": 2, "temp_final": 0.06}},
        "loss": {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 0,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1, "use_adaptive": False,
                                        "r1_reg_weight": 10.0,
                                        "r1_reg_every": 16}},
        "training": {"cumulative_bs": 256, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 250, "max_epochs": 300},
    }
    cfg = parse_config(raw)
    assert estimate_activation_gb(cfg, 32) < 12.0       # fits: remat off
    assert estimate_activation_gb(cfg, 48) > 12.0       # over: remat on
    assert estimate_activation_gb(cfg, 64) > 12.0
    raw["training"]["grad_accum_steps"] = 8
    cfg8 = parse_config(raw)
    assert estimate_activation_gb(cfg8, 256) < 12.0     # micro-batch 32


def test_xla_compiler_options_parsing(monkeypatch):
    """VQVAE_TPU_XLA_OPTS: k=v list parse, 'none' disable, TPU-only default."""
    from vqvae_tpu.train.steps import _xla_compiler_options

    monkeypatch.setenv("VQVAE_TPU_XLA_OPTS",
                       "xla_tpu_scoped_vmem_limit_kib=32768, foo=bar")
    assert _xla_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "32768", "foo": "bar"}

    monkeypatch.setenv("VQVAE_TPU_XLA_OPTS", "none")
    assert _xla_compiler_options() is None

    # unset -> default applies only on TPU backends (None on the CPU tests)
    monkeypatch.delenv("VQVAE_TPU_XLA_OPTS", raising=False)
    assert _xla_compiler_options() is None


def test_pad_conv_out_exact(monkeypatch):
    """VQVAE_TPU_PAD_CONV_OUT=1 (decoder final conv computed at 8 padded
    output lanes) leaves parameters/checkpoint paths identical and is
    numerically equivalent to fp32 accumulation-order tolerance: the
    padded channel count changes how XLA tiles/reassociates the conv
    reductions inside the fused decoder, so outputs and gradients agree
    to rounding, not bit-exactly (the padded channels themselves are
    exactly zero — the math is the same, the summation order is not)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqvae_tpu.models.autoencoder import Decoder

    def build(flag):
        monkeypatch.setenv("VQVAE_TPU_PAD_CONV_OUT", flag)
        dec = Decoder(channels=32, num_res_blocks=1,
                      channel_multipliers=[1, 2], embedding_dim=8)
        z = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 8),
                        jnp.float32)
        params = dec.init(jax.random.PRNGKey(0), z)["params"]

        def loss(p):
            y = dec.apply({"params": p}, z)
            return jnp.sum(y * y), y

        (l, y), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
        return params, l, y, g

    p0, l0, y0, g0 = build("0")
    p1, l1, y1, g1 = build("1")

    # identical param trees (paths AND init values)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    flat0 = jax.tree_util.tree_flatten_with_path(g0)[0]
    flat1 = jax.tree.leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))
