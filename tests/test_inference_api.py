"""Second-stage tokenizer API (reference model.py:458-489 contract):
get_tokens / quantize / reconstruct / reconstruct_from_tokens, plus the
adaptive-g-weight training path and introspection utilities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.vqvae import VQVAE, model_rngs

IMG, N, D = 16, 32, 8


def make_model(q_type="standard"):
    params = {"commitment_cost": 0.25}
    if q_type == "ema":
        params.update(decay=0.95, epsilon=1e-5)
    if q_type == "gumbel":
        params = {"straight_through": False, "temp": 1.0, "kl_cost": 0.01}
    model = VQVAE(image_size=IMG, channels=32, num_res_blocks=1,
                  channel_multipliers=(1, 2), num_embeddings=N,
                  embedding_dim=D, quantizer_type=q_type,
                  quantizer_params=tuple(sorted(params.items())))
    x = jnp.zeros((2, IMG, IMG, 3))
    variables = model.init(model_rngs(0, q_type), x, train=False)
    return model, variables


@pytest.mark.parametrize("q_type", ["standard", "ema", "gumbel"])
def test_tokenize_reconstruct_roundtrip(q_type):
    model, variables = make_model(q_type)
    images = jnp.asarray(np.random.RandomState(0).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    rngs = {"gumbel": jax.random.PRNGKey(1)} if q_type == "gumbel" else None

    tokens = model.apply(variables, images, method="get_tokens", rngs=rngs)
    assert tokens.shape == (2, (IMG // 4) ** 2)
    assert tokens.dtype in (jnp.int32, jnp.int64)
    assert int(tokens.max()) < N and int(tokens.min()) >= 0

    recon = model.apply(variables, tokens, method="reconstruct_from_tokens")
    assert recon.shape == (2, IMG, IMG, 3)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0

    # decoding is a pure function of tokens: same tokens -> same recon
    recon2 = model.apply(variables, tokens, method="reconstruct_from_tokens")
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(recon2))


def test_quantize_and_reconstruct_shapes():
    model, variables = make_model("standard")
    images = jnp.asarray(np.random.RandomState(1).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    q = model.apply(variables, images, method="quantize")
    assert q.shape == (2, (IMG // 4) ** 2, D)

    r = model.apply(variables, images, method="reconstruct")
    assert r.shape == images.shape
    assert float(r.min()) >= 0.0 and float(r.max()) <= 1.0


def test_tokens_consistent_with_forward():
    """get_tokens must agree with the codes the forward pass assigns."""
    model, variables = make_model("standard")
    images = jnp.asarray(np.random.RandomState(2).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    tokens = model.apply(variables, images, method="get_tokens")
    from vqvae_tpu.models.preprocess import preprocess_batch
    _, _, codes = model.apply(variables, preprocess_batch(images), train=False)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(codes))


def test_gumbel_deterministic_codes_flag():
    model, variables = make_model("gumbel")
    images = jnp.asarray(np.random.RandomState(3).rand(2, IMG, IMG, 3)
                         .astype(np.float32))
    t1 = model.apply(variables, images, method="get_tokens",
                     deterministic=True, rngs={"gumbel": jax.random.PRNGKey(0)})
    t2 = model.apply(variables, images, method="get_tokens",
                     deterministic=True, rngs={"gumbel": jax.random.PRNGKey(9)})
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_adaptive_g_weight_step():
    """GAN train step with use_adaptive=True produces a finite, positive,
    clamped g_weight (reference loss.py:80-96)."""
    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    raw = {
        "image_size": IMG,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": N, "embedding_dim": D,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "loss": {"l1_weight": 0.8, "l2_weight": 0.2, "perc_weight": 1.0,
                 "adversarial_params": {"start_epoch": 0,
                                        "loss_type": "hinge",
                                        "g_weight": 0.8,
                                        "use_adaptive": True,
                                        "r1_reg_weight": None,
                                        "r1_reg_every": 16}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    }
    cfg = parse_config(raw)
    trainer = Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=2)
    state = trainer.init_state()
    batch = {"image": np.random.RandomState(0).randint(
        0, 255, (8, IMG, IMG, 3), np.uint8)}
    state, metrics = trainer.train_step(state, batch, epoch=0)
    gw = float(metrics["g_weight"])
    assert np.isfinite(gw) and 0.0 <= gw <= 0.8 * 1e4
    assert np.isfinite(float(metrics["loss"]))


def test_lpips_squeeze_variant():
    from vqvae_tpu.models.lpips import LPIPS
    m = LPIPS(net_type="squeeze")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32) * 0.3)
    variables = m.init(jax.random.PRNGKey(0), x, x)
    assert float(m.apply(variables, x, x)) == pytest.approx(0.0, abs=1e-6)
    assert float(m.apply(variables, x, x + 0.3)) > 0.0


def test_introspect_utils():
    from vqvae_tpu.utils.introspect import check_replication, param_summary
    model, variables = make_model("standard")
    summary = param_summary(variables["params"])
    assert "TOTAL" in summary and "encoder" in summary

    # replicated array across the 8-device mesh passes the check
    from vqvae_tpu.parallel.mesh import create_mesh, replicate
    mesh = create_mesh()
    tree = replicate({"w": jnp.ones((8, 8))}, mesh)
    check_replication(tree)
