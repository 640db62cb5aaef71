"""Quantizer math: parity against the reference torch implementations (same
weights + inputs) and unit properties (straight-through, EMA update, usage
metrics, dead-code reinit).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqvae_tpu.models.quantizers import (
    EMAVectorQuantizer,
    EntropyVectorQuantizer,
    GumbelVectorQuantizer,
    VectorQuantizer,
    codes_to_vec,
    count_code_usage,
    get_codebook_usage,
    reinit_unused_codes,
)

N, D, B, H, W = 32, 8, 2, 4, 4


@pytest.fixture(scope="module")
def torch_ref(reference_path):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, reference_path)
    from vqvae.modules import vector_quantizers as ref_vq  # noqa
    return torch, ref_vq


def _inputs(seed=0):
    rs = np.random.RandomState(seed)
    z = rs.randn(B, H, W, D).astype(np.float32)
    cb = rs.randn(N, D).astype(np.float32) * 0.1
    return z, cb


def test_standard_parity(torch_ref):
    torch, ref_vq = torch_ref
    z, cb = _inputs()

    q_t = ref_vq.VectorQuantizer(N, D, 0.25)
    with torch.no_grad():
        q_t.codebook.weight.copy_(torch.from_numpy(cb))
    zq_t, codes_t, loss_t = q_t(torch.from_numpy(z.transpose(0, 3, 1, 2)))

    q_j = VectorQuantizer(N, D, 0.25)
    zq_j, codes_j, loss_j = q_j.apply({"params": {"codebook": cb}},
                                      jnp.asarray(z), train=True)
    np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())
    np.testing.assert_allclose(np.asarray(zq_j),
                               zq_t.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


def test_standard_straight_through():
    z, cb = _inputs()
    q_j = VectorQuantizer(N, D, 0.25)

    def recon_sum(zz):
        zq, _, _ = q_j.apply({"params": {"codebook": cb}}, zz)
        return jnp.sum(zq)

    g = jax.grad(recon_sum)(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), np.ones_like(z), atol=1e-6)


def test_ema_parity(torch_ref):
    torch, ref_vq = torch_ref
    z, cb = _inputs(1)

    q_t = ref_vq.EMAVectorQuantizer(N, D, 0.25, decay=0.9, epsilon=1e-5)
    with torch.no_grad():
        q_t.codebook.weight.copy_(torch.from_numpy(cb))
        q_t.ema_weight.copy_(torch.from_numpy(cb))
        q_t.ema_count.fill_(1.0)
    q_t.train()
    zq_t, codes_t, loss_t = q_t(torch.from_numpy(z.transpose(0, 3, 1, 2)))

    q_j = EMAVectorQuantizer(N, D, 0.25, decay=0.9, epsilon=1e-5)
    variables = {"vq_state": {"codebook": jnp.asarray(cb),
                              "ema_count": jnp.ones((N,), jnp.float32),
                              "ema_weight": jnp.asarray(cb)}}
    (zq_j, codes_j, loss_j), updated = q_j.apply(
        variables, jnp.asarray(z), train=True, mutable=["vq_state"])

    np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["vq_state"]["ema_count"]),
                               q_t.ema_count.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(updated["vq_state"]["ema_weight"]),
                               q_t.ema_weight.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated["vq_state"]["codebook"]),
                               q_t.codebook.weight.detach().numpy(),
                               rtol=1e-4, atol=1e-6)


def test_ema_eval_does_not_mutate():
    z, cb = _inputs(2)
    q_j = EMAVectorQuantizer(N, D)
    variables = {"vq_state": {"codebook": jnp.asarray(cb),
                              "ema_count": jnp.ones((N,), jnp.float32),
                              "ema_weight": jnp.asarray(cb)}}
    _, updated = q_j.apply(variables, jnp.asarray(z), train=False,
                           mutable=["vq_state"])
    np.testing.assert_array_equal(np.asarray(updated["vq_state"]["codebook"]), cb)


def test_entropy_parity(torch_ref):
    torch, ref_vq = torch_ref
    z, cb = _inputs(3)

    for loss_type in ("softmax", "argmax"):
        q_t = ref_vq.EntropyVectorQuantizer(N, D, 0.1, 0.05, loss_type, 0.25)
        with torch.no_grad():
            q_t.codebook.weight.copy_(torch.from_numpy(cb))
        zq_t, codes_t, loss_t = q_t(torch.from_numpy(z.transpose(0, 3, 1, 2)))

        q_j = EntropyVectorQuantizer(N, D, 0.1, 0.05, loss_type, 0.25)
        zq_j, codes_j, loss_j = q_j.apply({"params": {"codebook": cb}},
                                          jnp.asarray(z))
        np.testing.assert_array_equal(np.asarray(codes_j), codes_t.numpy())
        np.testing.assert_allclose(float(loss_j), float(loss_t),
                                   rtol=2e-4, atol=1e-5)


def test_gumbel_forward_and_kl():
    """Gumbel sampling differs by RNG from torch; check shapes, straight-
    through hardness at eval, and the KL term against a manual computation."""
    rs = np.random.RandomState(4)
    z = rs.randn(B, H, W, N).astype(np.float32)
    q_j = GumbelVectorQuantizer(N, D, straight_through=False, temp=1.0,
                                kl_cost=0.1)
    variables = q_j.init({"params": jax.random.PRNGKey(0),
                          "gumbel": jax.random.PRNGKey(1)}, jnp.asarray(z))
    zq, codes, kl = q_j.apply(variables, jnp.asarray(z), train=False,
                              rngs={"gumbel": jax.random.PRNGKey(2)})
    assert zq.shape == (B, H, W, D)
    assert codes.shape == (B, H * W)

    # eval => hard one-hot: quantized rows must be exact codebook rows
    cb = np.asarray(variables["params"]["codebook"])
    flat = np.asarray(zq).reshape(-1, D)
    flat_codes = np.asarray(codes).reshape(-1)
    np.testing.assert_allclose(flat, cb[flat_codes], rtol=1e-5, atol=1e-6)

    # KL against manual: mean over pixels of sum qy*log(qy*N)
    k = np.asarray(variables["params"]["x_to_logits_kernel"])[0, 0]
    b_ = np.asarray(variables["params"]["x_to_logits_bias"])
    logits = z.reshape(-1, N) @ k + b_
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    kl_manual = 0.1 * np.mean(np.sum(p * np.log(p * N + 1e-10), axis=-1))
    np.testing.assert_allclose(float(kl), kl_manual, rtol=1e-4)


def test_codebook_usage_metrics():
    counts = jnp.array([0, 0, 5, 5, 5, 5, 0, 0], jnp.float32)
    probs, perplexity, used = get_codebook_usage(counts)
    assert float(used) == pytest.approx(50.0)
    assert float(perplexity) == pytest.approx(4.0, rel=1e-3)
    np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-6)


def test_reinit_unused_codes():
    cb = jnp.arange(8 * 2, dtype=jnp.float32).reshape(8, 2)
    probs = jnp.array([0.5, 0.5, 0, 0, 0, 0, 0, 0], jnp.float32)
    new_cb = reinit_unused_codes(cb, probs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(new_cb[:2]), np.asarray(cb[:2]))
    used_rows = np.asarray(cb[:2])
    for row in np.asarray(new_cb[2:]):
        assert any(np.allclose(row, u) for u in used_rows)


def test_count_code_usage():
    codes = jnp.array([[0, 1, 1], [3, 3, 3]], jnp.int32)
    counts = count_code_usage(codes, 5)
    np.testing.assert_array_equal(np.asarray(counts), [1, 2, 0, 3, 0])


def test_codes_to_vec():
    _, cb = _inputs()
    codes = jnp.array([[0, 5], [3, 1]], jnp.int32)
    v = codes_to_vec(jnp.asarray(cb), codes)
    assert v.shape == (2, 2, D)
    np.testing.assert_allclose(np.asarray(v[0, 1]), cb[5])


def test_reinit_noise_scale_breaks_exact_copies():
    """noise_scale=0 -> exact reference copies; >0 -> near-but-distinct rows
    (an exact copy ties with its source under argmin and can never win)."""
    import jax
    from vqvae_tpu.models.quantizers import (
        reinit_unused_codes, reinit_unused_codes_ema)

    rs = np.random.RandomState(0)
    cb = jnp.asarray(rs.randn(8, 4), jnp.float32)
    usage = jnp.array([4., 0., 3., 0., 1., 2., 0., 6.])
    probs = usage / usage.sum()
    rng = jax.random.PRNGKey(1)

    exact = np.asarray(reinit_unused_codes(cb, probs, rng, noise_scale=0.0))
    noisy = np.asarray(reinit_unused_codes(cb, probs, rng, noise_scale=0.05))
    dead = np.array([1, 3, 6])
    live = np.array([0, 2, 4, 5, 7])
    # live rows untouched in both
    np.testing.assert_array_equal(exact[live], np.asarray(cb)[live])
    np.testing.assert_array_equal(noisy[live], np.asarray(cb)[live])
    # exact copies come from the live set; noisy rows are near but distinct
    for r in dead:
        assert any(np.array_equal(exact[r], np.asarray(cb)[s]) for s in live)
        assert not any(np.array_equal(noisy[r], np.asarray(cb)[s]) for s in live)
        assert np.min(np.linalg.norm(np.asarray(cb)[live] - noisy[r], axis=1)) < 1.0

    # EMA variant stays accumulator-consistent with noise
    count = jnp.asarray(rs.rand(8) + 0.5, jnp.float32)
    weight = cb * count[:, None]
    ncb, nw, nc = reinit_unused_codes_ema(cb, weight, count, probs, rng,
                                          noise_scale=0.05)
    derived = np.asarray(nw) / np.asarray(nc)[:, None]
    np.testing.assert_allclose(derived[dead], np.asarray(ncb)[dead], rtol=1e-5)


def test_masked_loss_equals_unpadded():
    """Quantizer loss with mask over a zero-padded batch == the loss of the
    valid rows alone (the eval contract for partial final batches). For
    gumbel only the (noise-free) KL loss is comparable across batch shapes;
    for the entropy quantizer this also pins the batch-coupled avg_entropy
    term to the masked distribution."""
    rs = np.random.RandomState(7)
    z_valid = rs.randn(2, H, W, D).astype(np.float32)
    z_pad = np.concatenate([z_valid, np.zeros((2, H, W, D), np.float32)])
    mask = jnp.asarray([True, True, False, False])

    for q in [VectorQuantizer(N, D, commitment_cost=0.25),
              EMAVectorQuantizer(N, D, commitment_cost=0.25),
              EntropyVectorQuantizer(N, D, ent_loss_ratio=0.1,
                                     ent_temperature=0.05,
                                     ent_loss_type="softmax")]:
        variables = q.init(jax.random.PRNGKey(0), jnp.asarray(z_valid))
        _, _, loss_valid = q.apply(variables, jnp.asarray(z_valid))
        _, _, loss_masked = q.apply(variables, jnp.asarray(z_pad), mask=mask)
        np.testing.assert_allclose(np.asarray(loss_masked),
                                   np.asarray(loss_valid), rtol=1e-5,
                                   err_msg=type(q).__name__)
        # without the mask the padded rows bias the loss (regression guard)
        _, _, loss_unmasked = q.apply(variables, jnp.asarray(z_pad))
        assert not np.allclose(np.asarray(loss_unmasked),
                               np.asarray(loss_valid), rtol=1e-3)

    # gumbel: the KL term is sampling-free, so masked == unpadded exactly
    qg = GumbelVectorQuantizer(N, D, straight_through=False, temp=1.0,
                               kl_cost=1.0)
    zg_valid = rs.randn(2, H, W, N).astype(np.float32)
    zg_pad = np.concatenate([zg_valid, np.zeros((2, H, W, N), np.float32)])
    variables = qg.init({"params": jax.random.PRNGKey(0),
                         "gumbel": jax.random.PRNGKey(1)},
                        jnp.asarray(zg_valid))
    rngs = {"gumbel": jax.random.PRNGKey(2)}
    _, _, kl_valid = qg.apply(variables, jnp.asarray(zg_valid), rngs=rngs)
    _, _, kl_masked = qg.apply(variables, jnp.asarray(zg_pad), mask=mask,
                               rngs=rngs)
    np.testing.assert_allclose(np.asarray(kl_masked), np.asarray(kl_valid),
                               rtol=1e-5)
