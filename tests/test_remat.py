"""Rematerialization: remat=True must not change forward values or gradients
(it only changes the backward-pass memory/FLOP tradeoff)."""

import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.models.autoencoder import Decoder, Encoder
from vqvae_tpu.models.discriminator import Discriminator


def test_encoder_remat_equivalence():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3)
                    .astype(np.float32))
    kwargs = dict(channels=32, num_res_blocks=1, channel_multipliers=(1, 2),
                  embedding_dim=8)
    enc = Encoder(**kwargs, remat=False)
    enc_r = Encoder(**kwargs, remat=True)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    y = enc.apply({"params": params}, x)
    y_r = enc_r.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r), atol=1e-6)

    def loss(p, module):
        return jnp.sum(module.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params, enc)
    g_r = jax.grad(loss)(params, enc_r)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_discriminator_remat_equivalence():
    x = jnp.asarray(np.random.RandomState(1).randn(4, 16, 16, 3)
                    .astype(np.float32))
    d = Discriminator(img_resolution=16, remat=False)
    d_r = Discriminator(img_resolution=16, remat=True)
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    y = d.apply({"params": params}, x)
    y_r = d_r.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_r),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# auto-remat gate: runtime memory audit (loop.Trainer.check_remat_gate)

def _tiny_trainer(remat=None):
    from vqvae_tpu.config import parse_config
    from vqvae_tpu.train.loop import Trainer

    cfg = parse_config({
        "image_size": 16,
        "autoencoder": {"channels": 32, "num_res_blocks": 1,
                        "channel_multipliers": [1, 2]},
        "quantizer": {"num_embeddings": 32, "embedding_dim": 8,
                      "type": "standard", "reinit_every_n_epochs": None,
                      "params": {"commitment_cost": 0.25}},
        "training": {"cumulative_bs": 8, "base_lr": 1e-4,
                     "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                     "decay_epochs": 2, "max_epochs": 2},
    })
    return Trainer(cfg=cfg, learning_rate=1e-4, seed=0, steps_per_epoch=1,
                   mesh=None, remat=remat, per_device_batch=8)


class _FakeDev:
    def __init__(self, peak, limit):
        self._stats = {"peak_bytes_in_use": peak, "bytes_limit": limit}

    def memory_stats(self):
        return self._stats


def test_remat_gate_warns_near_oom(monkeypatch):
    """auto remat=False + >92% peak -> warning naming the estimate."""
    tr = _tiny_trainer(remat=None)
    assert tr._remat_auto and tr.remat is False  # 16px auto-resolves to off
    monkeypatch.setattr(jax, "local_devices",
                        lambda: [_FakeDev(15.2e9, 16.0e9)])
    msg = tr.check_remat_gate(verbose=False)
    assert msg is not None and "OOM" in msg and "under-estimated" in msg


def test_remat_gate_warns_wasteful_remat(monkeypatch):
    """auto remat=True + <45% peak -> recompute-tax warning."""
    tr = _tiny_trainer(remat=None)
    tr.remat = True  # simulate the estimate having flipped remat on
    monkeypatch.setattr(jax, "local_devices",
                        lambda: [_FakeDev(4.0e9, 16.0e9)])
    msg = tr.check_remat_gate(verbose=False)
    assert msg is not None and "recompute" in msg and "over-estimated" in msg


def test_remat_gate_silent_cases(monkeypatch):
    # explicit remat: user decided, never second-guess
    tr = _tiny_trainer(remat=False)
    monkeypatch.setattr(jax, "local_devices",
                        lambda: [_FakeDev(15.9e9, 16.0e9)])
    assert tr.check_remat_gate(verbose=False) is None

    # auto + comfortable footprint: no warning
    tr2 = _tiny_trainer(remat=None)
    monkeypatch.setattr(jax, "local_devices",
                        lambda: [_FakeDev(10.0e9, 16.0e9)])
    assert tr2.check_remat_gate(verbose=False) is None

    # backends without stats (CPU): no-op
    class _NoStats:
        def memory_stats(self):
            return None

    tr3 = _tiny_trainer(remat=None)
    monkeypatch.setattr(jax, "local_devices", lambda: [_NoStats()])
    assert tr3.check_remat_gate(verbose=False) is None
