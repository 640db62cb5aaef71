import numpy as np

import jax
import jax.numpy as jnp

from vqvae_tpu.models.preprocess import (
    denormalize,
    normalize,
    preprocess_batch,
    random_resized_crop_flip,
)


def test_normalize_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(denormalize(normalize(x))),
                               np.asarray(x), rtol=1e-5, atol=1e-6)
    assert float(normalize(x).min()) >= -1.0
    assert float(normalize(x).max()) <= 1.0


def test_preprocess_eval_is_pure_normalize():
    x = jnp.asarray(np.random.RandomState(1).rand(2, 8, 8, 3).astype(np.float32))
    y = preprocess_batch(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2 - 1, atol=1e-6)


def test_augmentations_shape_and_range():
    x = jnp.asarray(np.random.RandomState(2).rand(4, 16, 16, 3).astype(np.float32))
    y = preprocess_batch(x, rng=jax.random.PRNGKey(0), training=True)
    assert y.shape == x.shape
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0


def test_full_scale_crop_is_identity_or_flip():
    """With scale pinned to 1.0 the crop is the full image: result must be the
    image or its horizontal flip."""
    x = jnp.asarray(np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
                    / (2 * 8 * 8 * 3))
    y = random_resized_crop_flip(jax.random.PRNGKey(3), x, 8,
                                 scale_range=(1.0, 1.0))
    for i in range(2):
        yi, xi = np.asarray(y[i]), np.asarray(x[i])
        assert (np.allclose(yi, xi, atol=1e-5)
                or np.allclose(yi, xi[:, ::-1, :], atol=1e-5))


def test_crops_differ_per_sample():
    x = jnp.asarray(np.random.RandomState(4).rand(8, 16, 16, 3).astype(np.float32))
    y = random_resized_crop_flip(jax.random.PRNGKey(5), x, 16,
                                 scale_range=(0.7, 0.71))
    diffs = [not np.allclose(np.asarray(y[i]), np.asarray(x[i])) for i in range(8)]
    assert sum(diffs) >= 7
