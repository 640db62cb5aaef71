"""Evaluation metrics: L2 / PSNR / SSIM (+ rFID in vqvae_tpu/eval/fid.py).

Replaces the reference's torchmetrics suite (model.py:16-19, 491-562):
- MeanSquaredError: global mean over all pixels/updates
- PeakSignalNoiseRatio: 10*log10(data_range^2 / global_mse); data_range
  fixed to 1.0 (images are [0,1]; the torchmetrics default infers the range
  from data, documented divergence — fixed range is the principled choice)
- StructuralSimilarityIndexMeasure defaults: gaussian kernel 11, sigma 1.5,
  k1=0.01, k2=0.03, mean over images

All metrics are streaming accumulators with a per-sample validity mask so the
padded final eval batch contributes nothing (the reference leans on torch's
dynamic batch shapes instead; XLA wants static shapes).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


def _gaussian_blur(x: jnp.ndarray, size: int = 11, sigma: float = 1.5):
    """Separable valid-padding gaussian filter, depthwise over NHWC."""
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    c = x.shape[-1]
    kv = jnp.tile(k[:, None, None, None], (1, 1, 1, c))
    kh = jnp.tile(k[None, :, None, None], (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def ssim_per_sample(pred: jnp.ndarray, target: jnp.ndarray,
                    data_range: float = 1.0, kernel_size: int = 11,
                    sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03):
    """Per-sample SSIM (B,), torchmetrics-compatible gaussian formulation."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _gaussian_blur(pred, kernel_size, sigma)
    mu_y = _gaussian_blur(target, kernel_size, sigma)
    mu_xx = _gaussian_blur(pred * pred, kernel_size, sigma)
    mu_yy = _gaussian_blur(target * target, kernel_size, sigma)
    mu_xy = _gaussian_blur(pred * target, kernel_size, sigma)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    ssim_map = num / den
    return jnp.mean(ssim_map, axis=(1, 2, 3))


@jax.jit
def mse_per_sample(pred: jnp.ndarray, target: jnp.ndarray):
    d = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.mean(d, axis=(1, 2, 3))


class ReconMetrics:
    """Streaming MSE / PSNR / SSIM with padded-batch masking."""

    def __init__(self, data_range: float = 1.0):
        self.data_range = data_range
        self._se_sum = 0.0    # sum of per-sample mean squared errors
        self._ssim_sum = 0.0
        self._n = 0

    def update(self, recons: np.ndarray, images: np.ndarray,
               mask: Optional[np.ndarray] = None):
        recons = jnp.asarray(recons)
        images = jnp.asarray(images)
        mse_s = np.asarray(mse_per_sample(recons, images))
        ssim_s = np.asarray(ssim_per_sample(recons, images, self.data_range))
        if mask is None:
            mask = np.ones((recons.shape[0],), bool)
        mask = np.asarray(mask, bool)
        self._se_sum += float(mse_s[mask].sum())
        self._ssim_sum += float(ssim_s[mask].sum())
        self._n += int(mask.sum())

    def reduce_across_hosts(self, allsum):
        """Merge per-host partial sums before compute() on multi-host eval.
        ``allsum(x) -> x summed over all processes`` (e.g. process_allgather
        + sum)."""
        self._se_sum = float(allsum(np.asarray(self._se_sum)))
        self._ssim_sum = float(allsum(np.asarray(self._ssim_sum)))
        self._n = int(allsum(np.asarray(self._n)))

    def compute(self) -> dict:
        n = max(self._n, 1)
        mse = self._se_sum / n
        psnr = 10.0 * np.log10(self.data_range ** 2 / max(mse, 1e-12))
        return {"mse": mse, "psnr": psnr, "ssim": self._ssim_sum / n}
