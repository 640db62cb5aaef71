"""b1==0 AdamW specialization (train/optim.py:scale_by_adam_b1zero).

The reference recipe's AdamW betas are (0.0, 0.99) everywhere
(example_confs/*.yaml, reference model.py:407-409), which makes Adam's first
moment identically the gradient — the specialized transformation drops the
``mu`` state array. These tests pin:

  1. bit-exact update parity vs optax.adamw(b1=0) over multiple steps, for
     both the masked (AE) and unmasked (D) optimizers;
  2. the state actually carries no first moment;
  3. the VQVAE_TPU_ADAM_B1ZERO=0 escape hatch restores stock optax.adamw
     (mu-carrying state layout, for old checkpoints);
  4. b1 != 0 configs are untouched (stock optax.adamw).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqvae_tpu.train import optim


def _tree(seed):
    rs = np.random.RandomState(seed)
    return {
        "conv": {"kernel": jnp.asarray(rs.randn(3, 3, 8, 16), jnp.float32),
                 "bias": jnp.asarray(rs.randn(16), jnp.float32)},
        "norm": {"scale": jnp.asarray(rs.randn(8), jnp.float32)},
    }


def _run(opt, params, n_steps=5):
    state = opt.init(params)
    for i in range(n_steps):
        grads = jax.tree.map(
            lambda p, k=i: jnp.sin(p * (k + 1)), params)  # deterministic
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


@pytest.mark.parametrize("make,ref_mask", [
    (optim.make_ae_optimizer, optim.decay_mask),
    (optim.make_disc_optimizer, None),
])
def test_bitexact_vs_optax_adamw(make, ref_mask):
    params = _tree(0)
    fast = make(1e-3, (0.0, 0.99), 1e-8, 1e-4)
    ref = optax.adamw(1e-3, b1=0.0, b2=0.99, eps=1e-8,
                      weight_decay=1e-4, mask=ref_mask)
    p_fast, s_fast = _run(fast, params)
    p_ref, _ = _run(ref, params)
    for a, b in zip(jax.tree.leaves(p_fast), jax.tree.leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no first-moment array anywhere in the specialized state
    assert not any(isinstance(leaf, optax.ScaleByAdamState)
                   for leaf in jax.tree.leaves(
                       s_fast, is_leaf=lambda x: isinstance(
                           x, optax.ScaleByAdamState)))


def test_state_drops_mu():
    params = _tree(1)
    opt = optim.make_ae_optimizer(1e-3, (0.0, 0.99), 1e-8, 1e-4)
    state = opt.init(params)
    n_leaves = len(jax.tree.leaves(state))
    # nu (3 arrays) + count + decayed-weights/lr counters; adamw would add
    # 3 more mu arrays
    ref_state = optax.adamw(1e-3, b1=0.0, b2=0.99, eps=1e-8,
                            weight_decay=1e-4,
                            mask=optim.decay_mask).init(params)
    assert n_leaves == len(jax.tree.leaves(ref_state)) - 3


def test_escape_hatch_env(monkeypatch):
    monkeypatch.setenv("VQVAE_TPU_ADAM_B1ZERO", "0")
    importlib.reload(optim)
    try:
        opt = optim.make_ae_optimizer(1e-3, (0.0, 0.99), 1e-8, 1e-4)
        state = opt.init(_tree(2))
        assert any(isinstance(s, optax.ScaleByAdamState)
                   for s in jax.tree.leaves(
                       state, is_leaf=lambda x: isinstance(
                           x, optax.ScaleByAdamState)))
    finally:
        monkeypatch.delenv("VQVAE_TPU_ADAM_B1ZERO")
        importlib.reload(optim)


def test_nonzero_b1_uses_stock_adamw():
    opt = optim.make_disc_optimizer(1e-3, (0.9, 0.99), 1e-8, 1e-4)
    state = opt.init(_tree(3))
    assert any(isinstance(s, optax.ScaleByAdamState)
               for s in jax.tree.leaves(
                   state, is_leaf=lambda x: isinstance(
                       x, optax.ScaleByAdamState)))
