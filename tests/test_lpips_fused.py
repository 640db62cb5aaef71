"""Fused single-pass LPIPS (make_fused_lpips_vgg) vs the flax LPIPS module:
forward values AND y-gradients must agree — the fused path's hand-written
backward (conv transposes, relu masks, tie-split max-pool VJP, normalize VJP)
is pinned to autodiff of the module here, in fp32 for tight tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.lpips import LPIPS, init_lpips, make_fused_lpips_vgg

B, IMG = 2, 32


@pytest.fixture(scope="module")
def vgg_setup():
    module, params = init_lpips("vgg", IMG, seed=3)
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)
    y = np.clip(x + rs.uniform(-0.4, 0.4, x.shape), -1, 1).astype(np.float32)
    return params, jnp.asarray(x), jnp.asarray(y)


def test_fused_forward_matches_module_fp32(vgg_setup):
    params, x, y = vgg_setup
    module = LPIPS(net_type="vgg", dtype=jnp.float32)
    fused = make_fused_lpips_vgg(params, dtype=jnp.float32)

    d_mod = np.asarray(module.apply({"params": params}, x, y, reduce=False))
    d_fus = np.asarray(fused(x, y))
    assert d_fus.shape == (B,)
    np.testing.assert_allclose(d_fus, d_mod, rtol=1e-5, atol=1e-7)


def test_fused_gradient_matches_module_fp32(vgg_setup):
    params, x, y = vgg_setup
    module = LPIPS(net_type="vgg", dtype=jnp.float32)
    fused = make_fused_lpips_vgg(params, dtype=jnp.float32)

    def loss_mod(yy):
        return module.apply({"params": params}, x, yy)

    def loss_fus(yy):
        return jnp.mean(fused(x, yy))

    g_mod = np.asarray(jax.grad(loss_mod)(y))
    g_fus = np.asarray(jax.grad(loss_fus)(y))
    scale = np.abs(g_mod).max()
    assert scale > 0
    np.testing.assert_allclose(g_fus, g_mod, rtol=1e-4, atol=1e-6 * scale)

    # gradient w.r.t. x (the images) is identically zero by construction —
    # the training step never uses it (images are constants)
    gx = np.asarray(jax.grad(lambda xx: jnp.mean(fused(xx, y)))(x))
    assert (gx == 0).all()


def test_fused_bf16_close_to_module_bf16(vgg_setup):
    """The production dtype: same compute policy on both paths."""
    params, x, y = vgg_setup
    module = LPIPS(net_type="vgg", dtype=jnp.bfloat16)
    fused = make_fused_lpips_vgg(params, dtype=jnp.bfloat16)

    d_mod = float(module.apply({"params": params}, x, y))
    d_fus = float(jnp.mean(fused(x, y)))
    np.testing.assert_allclose(d_fus, d_mod, rtol=2e-2)

    g_mod = np.asarray(jax.grad(
        lambda yy: module.apply({"params": params}, x, yy))(y))
    g_fus = np.asarray(jax.grad(lambda yy: jnp.mean(fused(x, yy)))(y))
    # bf16 taps + reordered accumulations: compare direction + magnitude
    cos = (g_mod * g_fus).sum() / (
        np.linalg.norm(g_mod) * np.linalg.norm(g_fus) + 1e-30)
    assert cos > 0.999, cos
    np.testing.assert_allclose(np.linalg.norm(g_fus), np.linalg.norm(g_mod),
                               rtol=5e-2)


def test_trainer_fused_vs_module_step(monkeypatch):
    """One full GAN-less LPIPS train step: fused path (default) vs module
    path (env opt-out) must produce near-identical losses and parameters."""
    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    raw = {
        "image_size": IMG,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        # loss block WITHOUT adversarial -> VQLPIPS(alex) in the reference;
        # force vgg via adversarial=None is alex... use adversarial to get vgg
        "loss": {"l1_weight": 1.0, "l2_weight": 1.0, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 100,
                                        "loss_type": "non-saturating",
                                        "g_weight": 0.1,
                                        "use_adaptive": False,
                                        "r1_reg_weight": None,
                                        "r1_reg_every": 16}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-3,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    }
    batch = {"image": np.random.RandomState(1).randint(
        0, 255, (8, IMG, IMG, 3), np.uint8)}

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VQVAE_TPU_LPIPS_FUSED", flag)
        cfg = parse_config(raw)
        tr = Trainer(cfg=cfg, learning_rate=1e-3, seed=0, steps_per_epoch=4,
                     compute_dtype=jnp.float32, remat=False)
        state = tr.init_state()
        p_init = jax.tree.map(np.asarray, state.params)
        # pre-GAN epoch (start_epoch=100): LPIPS active, discriminator not
        state, metrics = tr.train_step(state, batch, epoch=0)
        outs[flag] = ({k: float(v) for k, v in metrics.items()},
                      jax.tree.map(np.asarray, state.params), p_init)

    m1, p1, i1 = outs["1"]
    m0, p0, i0 = outs["0"]
    np.testing.assert_allclose(m1["perc_loss"], m0["perc_loss"], rtol=1e-5)
    np.testing.assert_allclose(m1["loss"], m0["loss"], rtol=1e-5)
    # post-Adam params are NOT compared elementwise: betas (0.0, 0.99) make
    # the first update ~sign(g)*lr, amplifying fp reorder noise on near-zero
    # gradients (same caveat as test_grad_accumulation). Compare the update
    # DIRECTION instead.
    u1 = np.concatenate([(a - b).ravel() for a, b in
                         zip(jax.tree.leaves(p1), jax.tree.leaves(i1))])
    u0 = np.concatenate([(a - b).ravel() for a, b in
                         zip(jax.tree.leaves(p0), jax.tree.leaves(i0))])
    cos = (u1 * u0).sum() / (np.linalg.norm(u1) * np.linalg.norm(u0) + 1e-30)
    assert cos > 0.999, cos


def test_fused_mixed_dtype_cotangents(vgg_setup):
    """Production shape: fp32 images/recons under the bf16 compute policy —
    the custom VJP must return cotangents in the PRIMAL dtypes."""
    params, x, y = vgg_setup
    fused = make_fused_lpips_vgg(params, dtype=jnp.bfloat16)
    g = jax.grad(lambda yy: jnp.mean(fused(x, yy)))(y)
    assert g.dtype == y.dtype == jnp.float32
    assert np.isfinite(np.asarray(g)).all()
