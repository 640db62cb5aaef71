"""On-device image preprocessing + training augmentations.

Parity with the reference preprocessing contract
(vqvae/modules/abstract_modules/base_autoencoder.py:6-93):

- ``preprocess_batch``: clamp to [0,1], (train only) RandomResizedCrop
  (area scale 0.7-1.0, aspect ratio fixed 1.0) + RandomHorizontalFlip,
  then normalize to (-1, 1) with mean = std = 0.5.
- ``preprocess_visualization``: denormalize back to [0, 1] and clip.

The reference runs kornia augmentations on-GPU inside the Lightning module;
here the augmentations are pure jittable functions keyed by an explicit PRNG
key, executed on-TPU inside the train step (batched crop+resize via a single
vmapped ``jax.image.scale_and_translate`` — static output shape, no dynamic
slicing, XLA-friendly).

All images are NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> (-1,1) with mean=std=0.5 (base_autoencoder.py:17)."""
    return images * 2.0 - 1.0


def denormalize(images: jnp.ndarray) -> jnp.ndarray:
    """(-1,1) -> [0,1], clipped (base_autoencoder.py:52-61)."""
    return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)


def _crop_resize_one(img, crop_hw, y0, x0, out_size):
    """Resize crop [y0:y0+crop, x0:x0+crop] to (out_size, out_size), bilinear."""
    s = out_size / crop_hw
    scale = jnp.array([s, s], jnp.float32)
    translation = jnp.array([-y0 * s, -x0 * s], jnp.float32)
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]), (0, 1),
        scale, translation, method="linear", antialias=False)


def random_resized_crop_flip(rng: jax.Array, images: jnp.ndarray,
                             out_size: int,
                             scale_range=(0.7, 1.0)) -> jnp.ndarray:
    """Per-sample RandomResizedCrop(scale=scale_range, ratio=(1,1)) +
    RandomHorizontalFlip(p=0.5), batched (base_autoencoder.py:20-22)."""
    b, h, w, c = images.shape
    k_scale, k_y, k_x, k_flip = jax.random.split(rng, 4)

    area_scale = jax.random.uniform(k_scale, (b,), minval=scale_range[0],
                                    maxval=scale_range[1])
    # fixed aspect ratio 1.0 -> square crop side = sqrt(area_scale) * side
    crop_h = jnp.floor(jnp.sqrt(area_scale * h * w)).clip(1, min(h, w))
    y0 = jax.random.uniform(k_y, (b,)) * (h - crop_h)
    x0 = jax.random.uniform(k_x, (b,)) * (w - crop_h)
    y0 = jnp.floor(y0)
    x0 = jnp.floor(x0)

    out = jax.vmap(
        functools.partial(_crop_resize_one, out_size=out_size)
    )(images, crop_h, y0, x0)

    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    return jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)


def preprocess_batch(images: jnp.ndarray, rng: jax.Array | None = None,
                     training: bool = False,
                     image_size: int | None = None) -> jnp.ndarray:
    """[0,1] NHWC batch -> normalized (-1,1), with train-time augmentations
    (base_autoencoder.py:31-50). No gradients flow through (inputs are data).
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    images = jnp.clip(images.astype(jnp.float32), 0.0, 1.0)
    if training:
        assert rng is not None, "training preprocessing needs a PRNG key"
        size = image_size if image_size is not None else images.shape[1]
        images = random_resized_crop_flip(rng, images, size)
        images = jnp.clip(images, 0.0, 1.0)
    return normalize(images)


preprocess_visualization = denormalize
