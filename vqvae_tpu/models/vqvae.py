"""The VQ-VAE / VQGAN model: encoder -> quantizer -> decoder.

Flax module with the reference's model surface (vqvae/model.py:23-161,
458-489): forward returns (reconstructions, quantizer_loss, used_indices);
inference API exposes get_tokens / quantize / reconstruct /
reconstruct_from_tokens as apply-able methods.

TPU-native specifics:
- NHWC images in [0,1] at the API boundary (normalization to (-1,1) happens in
  ``vqvae_tpu.models.preprocess``, mirroring base_autoencoder.py:31-61).
- For the gumbel quantizer the encoder emits ``num_embeddings`` channels
  (reference model.py:130) and the forward threads call-time ``temp`` /
  ``kl_cost`` scalars so schedules never trigger recompilation.
- The EMA quantizer's state lives in the ``vq_state`` collection; pass
  ``mutable=['vq_state']`` and ``train=True`` to apply for training steps.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae_tpu.config import Config
from vqvae_tpu.models.autoencoder import Decoder, Encoder
from vqvae_tpu.models.preprocess import denormalize, preprocess_batch
from vqvae_tpu.models.quantizers import codes_to_vec, make_quantizer

Dtype = Any


class VQVAE(nn.Module):
    """Encoder + pluggable quantizer + decoder (reference model.py:25-161)."""

    image_size: int
    channels: int
    num_res_blocks: int
    channel_multipliers: tuple
    num_embeddings: int
    embedding_dim: int
    quantizer_type: str
    quantizer_params: tuple  # tuple of (key, value) pairs — hashable config
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False

    @classmethod
    def from_config(cls, cfg: Config, dtype=jnp.float32,
                    axis_name: Optional[str] = None,
                    remat: bool = False) -> "VQVAE":
        return cls(
            image_size=cfg.image_size,
            channels=cfg.autoencoder.channels,
            num_res_blocks=cfg.autoencoder.num_res_blocks,
            channel_multipliers=tuple(cfg.autoencoder.channel_multipliers),
            num_embeddings=cfg.quantizer.num_embeddings,
            embedding_dim=cfg.quantizer.embedding_dim,
            quantizer_type=cfg.quantizer.type,
            quantizer_params=tuple(sorted(cfg.quantizer.params.items())),
            dtype=dtype,
            axis_name=axis_name,
            remat=remat,
        )

    def setup(self):
        q_params = dict(self.quantizer_params)
        # gumbel: encoder emits codebook-size channels (reference model.py:130)
        encoder_out = (self.num_embeddings if self.quantizer_type == "gumbel"
                       else self.embedding_dim)
        self.encoder = Encoder(
            channels=self.channels,
            num_res_blocks=self.num_res_blocks,
            channel_multipliers=self.channel_multipliers,
            embedding_dim=encoder_out,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.decoder = Decoder(
            channels=self.channels,
            num_res_blocks=self.num_res_blocks,
            channel_multipliers=self.channel_multipliers,
            embedding_dim=self.embedding_dim,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.quantizer = make_quantizer(
            self.quantizer_type, self.num_embeddings, self.embedding_dim,
            q_params, axis_name=self.axis_name)

    def _quantize(self, z, train, temp=None, kl_cost=None, mask=None):
        if self.quantizer_type == "gumbel":
            return self.quantizer(z, train=train, temp=temp, kl_cost=kl_cost,
                                  mask=mask)
        return self.quantizer(z, train=train, mask=mask)

    def __call__(self, x, train: bool = False, temp=None, kl_cost=None,
                 mask=None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Normalized (-1,1) NHWC images -> (recon (-1,1), q_loss, codes (B,S)).

        Parity: reference model.py:151-161. ``mask``: optional (B,) bool —
        padded rows of a partial final eval batch are excluded from the
        quantizer-loss reductions (the reference never pads).
        """
        z = self.encoder(x)
        quantized, codes, q_loss = self._quantize(z, train, temp, kl_cost, mask)
        x_recon = self.decoder(quantized)
        return x_recon, q_loss, codes

    # ------------------------------------------------------------------
    # Inference / tokenizer API (reference model.py:458-489). Images are
    # NHWC in [0,1]; call via model.apply(vars, x, method='get_tokens', ...).
    # ------------------------------------------------------------------

    def get_tokens(self, images, deterministic: bool = False):
        """[0,1] images -> (B, S) codebook indices (model.py:458-465)."""
        x = preprocess_batch(images)
        z = self.encoder(x)
        if self.quantizer_type == "gumbel":
            return self.quantizer.vec_to_codes(z, deterministic=deterministic)
        return self.quantizer.vec_to_codes(z)

    def quantize(self, images, temp=None, kl_cost=None):
        """[0,1] images -> (B, S, D) quantized latents (model.py:467-473)."""
        x = preprocess_batch(images)
        z = self.encoder(x)
        quantized, _, _ = self._quantize(z, False, temp, kl_cost)
        b, h, w, d = quantized.shape
        return quantized.reshape(b, h * w, d)

    def reconstruct(self, images, temp=None, kl_cost=None):
        """[0,1] images -> [0,1] reconstructions (model.py:475-482)."""
        x = preprocess_batch(images)
        recon, _, _ = self(x, train=False, temp=temp, kl_cost=kl_cost)
        return denormalize(recon)

    def reconstruct_from_tokens(self, tokens):
        """(B, S) tokens -> [0,1] reconstructions (model.py:484-489)."""
        codebook = self._codebook()
        quantized = codes_to_vec(codebook, tokens)
        b, s, d = quantized.shape
        hw = int(round(s ** 0.5))
        quantized = quantized.reshape(b, hw, hw, d)
        return denormalize(self.decoder(quantized))

    def _codebook(self):
        if self.quantizer_type == "ema":
            return self.quantizer.get_variable("vq_state", "codebook")
        return self.quantizer.get_variable("params", "codebook")

    def encode(self, x):
        """Normalized images -> raw encoder latents."""
        return self.encoder(x)

    def decode(self, quantized):
        """Quantized latents -> normalized reconstructions."""
        return self.decoder(quantized)


def model_rngs(seed_or_key, quantizer_type: str, train: bool = True):
    """RNG dict for VQVAE.apply: gumbel sampling needs a 'gumbel' stream."""
    key = (jax.random.PRNGKey(seed_or_key)
           if isinstance(seed_or_key, int) else seed_or_key)
    if quantizer_type == "gumbel":
        k1, k2 = jax.random.split(key)
        return {"params": k1, "gumbel": k2}
    return {"params": key}
