"""Vector-quantization bottlenecks, TPU-native.

Four algorithms with behavioral parity to the reference
(vqvae/modules/vector_quantizers.py:8-381, base contract
vqvae/modules/abstract_modules/base_quantizer.py:6-102):

- ``VectorQuantizer``      — argmin assignment, codebook + commitment loss,
                             straight-through estimator.
- ``EMAVectorQuantizer``   — argmin assignment, codebook updated by exponential
                             moving averages held in an explicit ``vq_state``
                             flax collection. Unlike the reference (whose DDP
                             keeps EMA buffers replica-local and lets them
                             drift, SURVEY §5), the accumulators are reduced
                             across the data-parallel mesh axis with
                             ``lax.psum`` when ``axis_name`` is set — the
                             mathematically-correct global-batch EMA.
- ``GumbelVectorQuantizer``— gumbel-softmax relaxation with schedulable
                             temperature / KL cost, extra 1x1 conv to logits.
- ``EntropyVectorQuantizer``— MaskGIT-style entropy-regularized argmin.

All quantizers consume NHWC latents ``z: (B, H, W, D)`` and return
``(quantized (B,H,W,D), codes (B, H*W) int32, loss scalar)``.

Straight-through gradients use ``z + stop_gradient(q - z)``. The distance
computation ``|x|^2 + |c|^2 - 2 x c^T`` is a single MXU matmul; the fused
Pallas nearest-neighbor kernel in ``vqvae_tpu.ops.vq`` avoids materializing
the (B*H*W, N) distance matrix in HBM and is used automatically on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae_tpu.ops.vq import nearest_codes, nearest_codes_stats
from vqvae_tpu.models.autoencoder import conv_kernel_init, conv_bias_init_for

Dtype = Any


def codebook_init(num_embeddings: int):
    """Uniform init in +-1/num_embeddings (reference base_quantizer.py:27-31)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / num_embeddings
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _flatten(z: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int, int, int]]:
    b, h, w, d = z.shape
    return z.reshape(b * h * w, d), (b, h, w, d)


def _row_weights(mask: Optional[jnp.ndarray], hw: int) -> Optional[jnp.ndarray]:
    """(B,) bool sample mask -> (B*hw,) float row weights for flattened
    latents, or None. Used by eval to exclude zero-padded rows of a partial
    final batch from the quantizer loss (the reference never pads batches;
    torch dynamic shapes, datamodules.py:57-76)."""
    if mask is None:
        return None
    return jnp.repeat(mask.astype(jnp.float32), hw, total_repeat_length=mask.shape[0] * hw)


def _wmean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x over all elements; with w=(M,) row weights, the mean over
    elements of nonzero-weight rows only (x leading axis M)."""
    if w is None:
        return jnp.mean(x)
    wb = w.reshape((-1,) + (1,) * (x.ndim - 1))
    denom = jnp.sum(w) * (x.size // x.shape[0])
    return jnp.sum(x * wb) / jnp.maximum(denom, 1.0)


def codes_to_vec(codebook: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Lookup codes (B, S) -> (B, S, D) (reference base_quantizer.py:53-61)."""
    return jnp.take(codebook, codes, axis=0)


def get_codebook_usage(index_count: jnp.ndarray):
    """(probs, perplexity, %used) from per-code usage counts
    (reference base_quantizer.py:63-79)."""
    index_count = index_count.astype(jnp.float32)
    # guarded denominator: an all-zero histogram (e.g. a validation set that
    # produced no valid rows) yields perplexity 1 / usage 0 instead of NaN
    probs = index_count / jnp.maximum(jnp.sum(index_count), 1.0)
    perplexity = jnp.exp(-jnp.sum(probs * jnp.log(probs + 1e-10)))
    used_pct = jnp.count_nonzero(probs) * 100.0 / index_count.shape[0]
    return probs, perplexity, used_pct


def _reinit_rows(codebook, usage_probs, rng, noise_scale):
    """(unused mask, candidate replacement rows) for dead-code re-init.

    ``noise_scale > 0`` perturbs each resampled row by gaussian noise scaled
    by the per-dimension codebook std. This is an opt-in IMPROVEMENT over
    the reference: its exact-copy resampling (base_quantizer.py:96-102)
    cannot revive a plain-VQ code — the copy ties with its source under
    argmin, loses, therefore receives no gradient, and stays dead forever.
    Noise breaks the tie and gives the optimizer a direction. Default 0.0 =
    exact reference behavior."""
    n = usage_probs.shape[0]
    unused = usage_probs == 0.0
    # sample a replacement row for every slot (static shape); only unused rows use it
    logits = jnp.log(usage_probs + 1e-30)
    rng_pick, rng_noise = jax.random.split(rng)
    replacements = jax.random.categorical(rng_pick, logits, shape=(n,))
    rows = codebook[replacements]
    if noise_scale:
        std = jnp.std(codebook, axis=0, keepdims=True)
        rows = rows + noise_scale * std * jax.random.normal(
            rng_noise, rows.shape, rows.dtype)
    return unused, rows


def reinit_unused_codes(codebook: jnp.ndarray, usage_probs: jnp.ndarray,
                        rng: jax.Array,
                        noise_scale: float = 0.0) -> jnp.ndarray:
    """Re-initialize unused codebook rows by resampling rows from the usage
    distribution (reference base_quantizer.py:81-102), as a pure function.
    See _reinit_rows for the opt-in ``noise_scale``.
    """
    unused, rows = _reinit_rows(codebook, usage_probs, rng, noise_scale)
    return jnp.where(unused[:, None], rows, codebook)


def reinit_unused_codes_ema(codebook: jnp.ndarray, ema_weight: jnp.ndarray,
                            ema_count: jnp.ndarray, usage_probs: jnp.ndarray,
                            rng: jax.Array, noise_scale: float = 0.0):
    """Dead-code reinit for the EMA quantizer: resample codebook rows AND the
    EMA accumulators they are derived from.

    The reference's reinit only rewrites ``codebook.weight``
    (base_quantizer.py:96-102) — for the EMA quantizer that is a silent
    no-op, because the next training step overwrites the codebook with
    ``ema_weight / ema_count`` (vector_quantizers.py:169) computed from the
    UNTOUCHED accumulators, restoring the dead rows. (Never observed
    upstream: no example config combines ema with reinit.) Here the
    replacement rows' ``ema_weight``/``ema_count`` are copied too, so the
    reinitialized vector survives: w = ema_weight[r]/ema_count[r] =
    codebook[r] by construction. Deliberate fix, recorded in PARITY §2.4.
    ``noise_scale`` perturbs the resampled vector (see _reinit_rows); the
    accumulators are kept consistent (ema_weight = vector * ema_count).
    """
    n = usage_probs.shape[0]
    logits = jnp.log(usage_probs + 1e-30)
    rng_pick, rng_noise = jax.random.split(rng)
    replacements = jax.random.categorical(rng_pick, logits, shape=(n,))
    unused = usage_probs == 0.0
    rows = codebook[replacements]
    if noise_scale:
        std = jnp.std(codebook, axis=0, keepdims=True)
        rows = rows + noise_scale * std * jax.random.normal(
            rng_noise, rows.shape, rows.dtype)
    new_count = jnp.where(unused, ema_count[replacements], ema_count)
    new_cb = jnp.where(unused[:, None], rows, codebook)
    new_weight = jnp.where(unused[:, None], rows * new_count[:, None],
                           ema_weight)
    return new_cb, new_weight, new_count


def count_code_usage(codes: jnp.ndarray, num_embeddings: int,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-code usage histogram of int codes, XLA-friendly one-hot sum
    (replaces the reference's torch.bincount determinism hack, model.py:289-293).

    ``mask``: optional (B,) bool — rows with mask=False (zero-padded final
    eval batches, data/dataset.py Loader) are excluded from the histogram.
    """
    onehot = jax.nn.one_hot(codes.reshape(-1), num_embeddings, dtype=jnp.int32)
    if mask is not None:
        b = codes.shape[0]
        w = jnp.broadcast_to(mask.astype(jnp.int32)[:, None],
                             (b, codes.size // b)).reshape(-1)
        onehot = onehot * w[:, None]
    return jnp.sum(onehot, axis=0)


class VectorQuantizer(nn.Module):
    """Standard VQ with straight-through estimator
    (reference vector_quantizers.py:8-84)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z, train: bool = False, mask=None):
        codebook = self.param("codebook", codebook_init(self.num_embeddings),
                              (self.num_embeddings, self.embedding_dim), jnp.float32)
        flat_x, (b, h, w, d) = _flatten(z)
        rw = _row_weights(mask, h * w)

        codes = nearest_codes(flat_x, codebook)
        quantized = jnp.take(codebook, codes, axis=0)

        e_loss = self.commitment_cost * _wmean(
            (jax.lax.stop_gradient(quantized) - flat_x) ** 2, rw)
        q_loss = _wmean((quantized - jax.lax.stop_gradient(flat_x)) ** 2, rw)

        quantized = flat_x + jax.lax.stop_gradient(quantized - flat_x)
        quantized = quantized.reshape(b, h, w, d)
        codes = jax.lax.stop_gradient(codes.reshape(b, h * w))
        return quantized, codes, q_loss + e_loss

    def vec_to_codes(self, z):
        codebook = self.get_variable("params", "codebook")
        flat_x, (b, h, w, d) = _flatten(z)
        return nearest_codes(flat_x, codebook).reshape(b, h * w)


class EMAVectorQuantizer(nn.Module):
    """EMA-codebook VQ (reference vector_quantizers.py:87-203).

    Codebook and EMA accumulators live in the ``vq_state`` collection (never
    touched by the optimizer). When ``axis_name`` is set (running inside
    shard_map over the data mesh axis), assignment counts and code-sums are
    ``psum``-reduced so every replica applies the identical global-batch EMA
    update — fixing the reference's silent replica-local buffer drift
    (SURVEY §5 "distributed backend" subtlety).

    The Laplace smoothing intentionally replicates the reference's
    normalization by *batch size* ``b`` rather than the number of latent
    vectors ``b*h*w`` (vector_quantizers.py:164) for training parity.
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.95
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, z, train: bool = False, mask=None):
        init = codebook_init(self.num_embeddings)
        codebook_v = self.variable(
            "vq_state", "codebook",
            lambda: init(self.make_rng("params"),
                         (self.num_embeddings, self.embedding_dim)))
        ema_count_v = self.variable(
            "vq_state", "ema_count", lambda: jnp.zeros((self.num_embeddings,), jnp.float32))
        ema_weight_v = self.variable(
            "vq_state", "ema_weight",
            lambda: init(self.make_rng("params"),
                         (self.num_embeddings, self.embedding_dim)))

        codebook = codebook_v.value
        flat_x, (b, h, w, d) = _flatten(z)
        flat_x_sg = jax.lax.stop_gradient(flat_x)

        updating = train and self.is_mutable_collection("vq_state")
        if updating:
            # fused Pallas assignment + update statistics (ops/vq.py): one
            # pass produces codes, per-code counts and per-code input sums
            # with the distance and one-hot matrices resident in VMEM
            codes, counts, dw = nearest_codes_stats(flat_x_sg, codebook)
        else:
            codes = nearest_codes(flat_x_sg, codebook)
        quantized = jnp.take(codebook, codes, axis=0)

        if updating:
            batch = jnp.asarray(b, jnp.float32)
            if self.axis_name is not None:
                counts = jax.lax.psum(counts, self.axis_name)
                dw = jax.lax.psum(dw, self.axis_name)
                batch = jax.lax.psum(batch, self.axis_name)

            ema_count = ema_count_v.value * self.decay + (1 - self.decay) * counts
            # Laplace smoothing normalized by batch size (reference quirk,
            # vector_quantizers.py:164)
            ema_count = ((ema_count + self.epsilon)
                         / (batch + self.num_embeddings * self.epsilon) * batch)
            ema_weight = ema_weight_v.value * self.decay + (1 - self.decay) * dw

            ema_count_v.value = ema_count
            ema_weight_v.value = ema_weight
            codebook_v.value = ema_weight / ema_count[:, None]

        e_loss = self.commitment_cost * _wmean(
            (jax.lax.stop_gradient(quantized) - flat_x) ** 2,
            _row_weights(mask, h * w))

        quantized = flat_x + jax.lax.stop_gradient(quantized - flat_x)
        quantized = quantized.reshape(b, h, w, d)
        codes = codes.reshape(b, h * w)
        return quantized, codes, e_loss

    def vec_to_codes(self, z):
        codebook = self.get_variable("vq_state", "codebook")
        flat_x, (b, h, w, d) = _flatten(z)
        return nearest_codes(flat_x, codebook).reshape(b, h * w)


def gumbel_softmax(rng, logits, tau, hard: bool, axis: int = -1):
    """Gumbel-softmax sample (matches torch F.gumbel_softmax semantics)."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if hard:
        idx = jnp.argmax(y_soft, axis=axis)
        y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype, axis=axis)
        return y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    return y_soft


class GumbelVectorQuantizer(nn.Module):
    """Gumbel-softmax VQ (reference vector_quantizers.py:206-274).

    The encoder emits ``num_embeddings`` channels; an extra 1x1 conv maps them
    to logits. ``temp`` / ``kl_cost`` are *call-time* scalars so schedules run
    inside the jitted train step without recompilation.
    """

    num_embeddings: int
    embedding_dim: int
    straight_through: bool = False
    temp: float = 1.0
    kl_cost: float = 5e-4

    @nn.compact
    def __call__(self, z, train: bool = False, temp=None, kl_cost=None,
                 rng=None, mask=None):
        n = self.num_embeddings
        codebook = self.param("codebook", codebook_init(n),
                              (n, self.embedding_dim), jnp.float32)
        # x_to_logits: 1x1 conv N -> N (reference vector_quantizers.py:218)
        logits_kernel = self.param("x_to_logits_kernel", conv_kernel_init,
                                   (1, 1, n, n), jnp.float32)
        logits_bias = self.param("x_to_logits_bias", conv_bias_init_for(n),
                                 (n,), jnp.float32)

        temp = self.temp if temp is None else temp
        kl_cost = self.kl_cost if kl_cost is None else kl_cost
        if rng is None:
            rng = self.make_rng("gumbel")

        b, h, w, _ = z.shape
        logits = jnp.einsum("bhwn,nm->bhwm", z, logits_kernel[0, 0],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST) + logits_bias

        # deterministic (argmax-of-noised-logits) quantization at inference
        hard = self.straight_through if train else True
        soft_one_hot = gumbel_softmax(rng, logits, temp, hard=hard, axis=-1)

        flat_oh = soft_one_hot.reshape(b * h * w, n)
        quantized = jnp.matmul(flat_oh, codebook,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        quantized = quantized.reshape(b, h, w, self.embedding_dim)

        # KL(q || uniform) to spread codebook usage
        qy = jax.nn.softmax(logits, axis=-1)
        kl_per_pos = jnp.sum(qy * jnp.log(qy * n + 1e-10),
                             axis=-1).reshape(b * h * w)
        kl_loss = kl_cost * _wmean(kl_per_pos, _row_weights(mask, h * w))

        codes = jax.lax.stop_gradient(jnp.argmax(soft_one_hot, axis=-1).reshape(b, h * w))
        return quantized, codes, kl_loss

    def vec_to_codes(self, z, rng=None, deterministic: bool = False):
        """Codes from raw encoder output.

        The reference samples gumbel noise (tau=1, hard=True) on the *raw
        encoder channels*, bypassing x_to_logits (vector_quantizers.py:265-274)
        — a documented quirk replicated by default. ``deterministic=True``
        returns plain argmax instead.
        """
        b, h, w, n = z.shape
        if deterministic:
            codes = jnp.argmax(z, axis=-1)
        else:
            if rng is None:
                rng = self.make_rng("gumbel")
            g = jax.random.gumbel(rng, z.shape, z.dtype)
            codes = jnp.argmax(z + g, axis=-1)
        return codes.reshape(b, h * w)


class EntropyVectorQuantizer(nn.Module):
    """MaskGIT entropy-regularized VQ (reference vector_quantizers.py:277-381)."""

    num_embeddings: int
    embedding_dim: int
    ent_loss_ratio: float = 0.1
    ent_temperature: float = 0.01
    ent_loss_type: str = "softmax"
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z, train: bool = False, mask=None):
        codebook = self.param("codebook", codebook_init(self.num_embeddings),
                              (self.num_embeddings, self.embedding_dim), jnp.float32)
        flat_x, (b, h, w, d) = _flatten(z)
        rw = _row_weights(mask, h * w)

        # full distance matrix needed by the entropy loss (not just argmin)
        x2 = jnp.sum(flat_x ** 2, axis=1, keepdims=True)
        c2 = jnp.sum(codebook ** 2, axis=1)[None, :]
        xc = jnp.matmul(flat_x, codebook.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        distances = x2 - 2 * xc + c2

        codes = jnp.argmin(distances, axis=1)
        quantized = jnp.take(codebook, codes, axis=0)

        e_loss = self.commitment_cost * _wmean(
            (jax.lax.stop_gradient(quantized) - flat_x) ** 2, rw)
        q_loss = _wmean((quantized - jax.lax.stop_gradient(flat_x)) ** 2, rw)
        ent = self.ent_loss_ratio * entropy_loss(
            -distances, self.ent_temperature, self.ent_loss_type,
            row_weights=rw)

        quantized = flat_x + jax.lax.stop_gradient(quantized - flat_x)
        quantized = quantized.reshape(b, h, w, d)
        codes = jax.lax.stop_gradient(codes.reshape(b, h * w))
        return quantized, codes, e_loss + q_loss + ent

    def vec_to_codes(self, z):
        codebook = self.get_variable("params", "codebook")
        flat_x, (b, h, w, d) = _flatten(z)
        return nearest_codes(flat_x, codebook).reshape(b, h * w)


def entropy_loss(affinity: jnp.ndarray, temperature: float,
                 loss_type: str = "softmax",
                 row_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sample_entropy - avg_entropy over temperature-scaled affinities
    (reference vector_quantizers.py:296-328).

    ``row_weights``: optional (M,) weights — masked eval excludes padded rows
    from BOTH the per-sample entropy mean and the batch-average distribution
    (the avg_entropy term couples rows, so a post-hoc per-sample mask cannot
    express it; the mask must reach this reduction)."""
    n_classes = affinity.shape[-1]
    affinity = affinity / temperature
    probs = jax.nn.softmax(affinity, axis=-1)

    if loss_type == "softmax":
        target_probs = probs
    elif loss_type == "argmax":
        codes = jnp.argmax(affinity, axis=-1)
        one_hots = jax.nn.one_hot(codes, n_classes, dtype=probs.dtype)
        target_probs = probs - jax.lax.stop_gradient(probs - one_hots)
    else:
        raise ValueError(f"Entropy loss {loss_type} not supported")

    if row_weights is None:
        avg_probs = jnp.mean(target_probs, axis=0)
    else:
        avg_probs = (jnp.sum(target_probs * row_weights[:, None], axis=0)
                     / jnp.maximum(jnp.sum(row_weights), 1.0))
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))

    log_probs = jax.nn.log_softmax(affinity + 1e-5, axis=-1)
    sample_entropy = _wmean(-jnp.sum(target_probs * log_probs, axis=-1),
                            row_weights)
    return sample_entropy - avg_entropy


def make_quantizer(q_type: str, num_embeddings: int, embedding_dim: int,
                   params: dict, axis_name: Optional[str] = None) -> nn.Module:
    """Quantizer factory mirroring the reference dispatch (model.py:89-124)."""
    if q_type == "standard":
        return VectorQuantizer(
            num_embeddings, embedding_dim,
            commitment_cost=float(params["commitment_cost"]))
    if q_type == "ema":
        return EMAVectorQuantizer(
            num_embeddings, embedding_dim,
            commitment_cost=float(params["commitment_cost"]),
            decay=float(params["decay"]),
            epsilon=float(params["epsilon"]),
            axis_name=axis_name)
    if q_type == "gumbel":
        return GumbelVectorQuantizer(
            num_embeddings, embedding_dim,
            straight_through=bool(params["straight_through"]),
            temp=float(params["temp"]),
            kl_cost=float(params["kl_cost"]))
    if q_type == "entropy":
        return EntropyVectorQuantizer(
            num_embeddings, embedding_dim,
            ent_loss_ratio=float(params["ent_loss_ratio"]),
            ent_temperature=float(params["ent_temperature"]),
            ent_loss_type=str(params["ent_loss_type"]),
            commitment_cost=float(params["commitment_cost"]))
    raise ValueError(f"unrecognized quantizer: {q_type}")
