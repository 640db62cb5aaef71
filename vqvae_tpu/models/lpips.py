"""LPIPS perceptual distance in flax (VGG16 / AlexNet backbones).

Parity with the reference's vendored lpips-pytorch
(vqvae/modules/loss/lpips_pytorch/, 4 files):

- backbone feature taps: VGG16 after relu{1_2,2_2,3_3,4_3,5_3}
  (networks.py:94, target layers [4,9,16,23,30]); AlexNet after each of its 5
  ReLUs (networks.py:83, [2,5,8,10,12])
- input z-scored with shift (-.030,-.088,-.188) / scale (.458,.448,.450)
  (networks.py:42-52) — inputs are in (-1, 1)
- per-layer unit-normalization over channels (utils.py:6-8)
- frozen 1x1 'lin' heads, distance = batch-mean of summed per-layer
  spatially-averaged weighted squared diffs (lpips.py:31-38)

Pretrained torchvision backbone + richzhang lin-head weights are converted
once by ``tools/convert_lpips_weights.py`` into an .npz loaded here. In a
hermetic environment without the pretrained files, ``init_lpips`` falls back
to architecture-correct random parameters (useful for pipeline/throughput
work; quality runs require the converted weights — the loader warns).

All LPIPS parameters are frozen: they live outside every optimizer, passed to
the loss as a constant pytree (the reference reaches the same state via
requires_grad=False, networks.py:33-35).
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# z-score buffers (reference networks.py:42-52)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CHANNELS = (64, 128, 256, 512, 512)
ALEX_CHANNELS = (64, 192, 384, 256, 256)
SQUEEZE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


def _normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class VGG16Features(nn.Module):
    """torchvision VGG16 `.features` up to relu5_3, returning the 5 LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        taps = []
        idx = 0
        for stage, (ch, n_convs) in enumerate(cfg):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(_normalize_activation(x))
            if stage < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features`, returning the 5 LPIPS taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=2, name="conv0")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=2, name="conv1")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x))
        x = nn.Conv(256, (3, 3), padding=1, name="conv3")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x))
        x = nn.Conv(256, (3, 3), padding=1, name="conv4")(x)
        x = nn.relu(x)
        taps.append(_normalize_activation(x))
        return taps


class LPIPS(nn.Module):
    """LPIPS(x, y) for NHWC images in (-1, 1) (reference modules/lpips.py:8-38)."""

    net_type: str = "vgg"

    @nn.compact
    def __call__(self, x, y):
        if self.net_type == "vgg":
            net = VGG16Features(name="net")
            channels = VGG16_CHANNELS
        elif self.net_type == "alex":
            net = AlexNetFeatures(name="net")
            channels = ALEX_CHANNELS
        else:
            raise NotImplementedError(
                f"LPIPS net_type {self.net_type!r} not supported (vgg | alex)")

        def z_score(im):
            return (im.astype(jnp.float32) - _SHIFT) / _SCALE

        feat_x = net(z_score(x))
        feat_y = net(z_score(y))

        total = 0.0
        for i, (fx, fy, ch) in enumerate(zip(feat_x, feat_y, channels)):
            lin = self.param(f"lin{i}", nn.initializers.ones, (ch, 1), jnp.float32)
            diff = (fx - fy) ** 2
            weighted = jnp.einsum("bhwc,co->bhwo", diff, lin)
            total = total + jnp.mean(weighted, axis=(1, 2, 3))
        return jnp.mean(total)


def lpips_weights_path(net_type: str) -> Path:
    env = os.environ.get("VQVAE_TPU_LPIPS_WEIGHTS_DIR")
    base = Path(env) if env else Path.home() / ".cache" / "vqvae_tpu"
    return base / f"lpips_{net_type}.npz"


def init_lpips(net_type: str, image_size: int, seed: int = 0):
    """(module, params) — converted pretrained weights if available, else
    architecture-correct random init (with a warning)."""
    module = LPIPS(net_type=net_type)
    path = lpips_weights_path(net_type)
    if path.exists():
        flat = dict(np.load(path))
        params = _unflatten(flat)
        return module, jax.tree.map(jnp.asarray, params)
    warnings.warn(
        f"LPIPS pretrained weights not found at {path}; using random init. "
        "Run tools/convert_lpips_weights.py for quality-parity training.")
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = module.init(jax.random.PRNGKey(seed), dummy, dummy)["params"]
    return module, params


def _unflatten(flat: dict) -> dict:
    params = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return params


def flatten_params(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out
