"""InceptionV3 (FID variant) feature extractor in flax.

Port of the standard FID inception network (the TF-ported
`pt_inception-2015-12-05` weights used by torchmetrics / pytorch-fid — the
reference's rFID metric, model.py:497) with the FID-specific quirks:

- InceptionA/C/E pool branches use average pooling with
  count_include_pad=False
- the *second* InceptionE block (Mixed_7c) uses MAX pooling in its pool
  branch (faithful to the original TF graph)
- input pipeline matches torchmetrics' NoTrainInceptionV3
  ('inception-v3-compat', i.e. torch-fidelity's FeatureExtractorInceptionV3,
  what the reference's FrechetInceptionDistance() runs, model.py:497): uint8
  -> float 0..255 -> TF1-style bilinear resize to 299 (ASYMMETRIC coordinate
  mapping in = out * H/299, edge-clamped — NOT the half-pixel convention of
  torch F.interpolate) -> (x - 128) / 128 -> features -> global avg pool
  (pool3, 2048-d). The resize is expressed as two small dense matmuls
  (static shapes), which XLA runs on the MXU.

BatchNorm is folded into conv weights at conversion time
(tools/convert_inception_weights.py), so inference is conv+bias+relu only.
All convs run in fp32 (FID is precision-sensitive).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    """BasicConv2d with BN pre-folded: conv (bias) + relu."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = ((self.padding[0], self.padding[0]),
               (self.padding[1], self.padding[1]))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=True, dtype=jnp.float32,
                    name="conv")(x)
        return nn.relu(x)


def _avg_pool_cip_false(x, window=3):
    """3x3 stride-1 same avg pool with count_include_pad=False."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_pool = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    counts = jax.lax.reduce_window(
        jnp.broadcast_to(ones, (x.shape[0],) + x.shape[1:3] + (1,)),
        0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_pool / counts


def _max_pool(x, window=3, stride=2, pad=0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)])


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_cip_false(x)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_cip_false(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # Mixed_7b: 'avg' (cip=False); Mixed_7c: 'max'

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_cip_false(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=[(1, 1), (1, 1)])
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Full FID inception up to the 2048-d pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> (B, 2048)


def _tf1_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) interpolation matrix for TF1 resize_bilinear with
    align_corners=False: in_coord = out_coord * in/out (asymmetric, no
    half-pixel offsets), upper tap edge-clamped. This is the resize inside
    torch-fidelity's interpolate_bilinear_2d_like_tensorflow1x."""
    coords = np.arange(out_size, dtype=np.float64) * (in_size / out_size)
    lower = np.floor(coords).astype(np.int64)
    upper = np.minimum(lower + 1, in_size - 1)
    frac = (coords - lower).astype(np.float64)
    mat = np.zeros((out_size, in_size), np.float64)
    np.add.at(mat, (np.arange(out_size), lower), 1.0 - frac)
    np.add.at(mat, (np.arange(out_size), upper), frac)
    return mat.astype(np.float32)


def preprocess_fid_input(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> the exact torchmetrics/torch-fidelity 'inception-v3-compat'
    input: float 0..255, TF1 asymmetric bilinear resize to 299, (x-128)/128.

    (The reference's FrechetInceptionDistance feeds uint8 into
    NoTrainInceptionV3, model.py:497,536-541; FID is only comparable when
    the resize convention matches bit-for-bit, so this is NOT the half-pixel
    resize of pytorch-fid.) Resize order (raw 0..255 floats first, normalize
    after) mirrors torch-fidelity; both steps are linear so the order only
    matters for exact float agreement."""
    x = images_uint8.astype(jnp.float32)
    b, h, w, c = x.shape
    if (h, w) != (299, 299):
        mat_h = jnp.asarray(_tf1_bilinear_matrix(h, 299))
        mat_w = jnp.asarray(_tf1_bilinear_matrix(w, 299))
        x = jnp.einsum("bhwc,Hh->bHwc", x, mat_h,
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("bHwc,Ww->bHWc", x, mat_w,
                       precision=jax.lax.Precision.HIGHEST)
    return (x - 128.0) / 128.0


def make_pool3_extractor(weights_path: Path):
    """Jitted (uint8 images) -> (B, 2048) pool3 features."""
    from vqvae_tpu.models.lpips import _unflatten
    flat = dict(np.load(str(weights_path)))
    params = jax.tree.map(jnp.asarray, _unflatten(flat))
    model = InceptionV3Pool3()

    @jax.jit
    def extract(images_uint8):
        x = preprocess_fid_input(jnp.asarray(images_uint8))
        return model.apply({"params": params}, x)

    return extract
