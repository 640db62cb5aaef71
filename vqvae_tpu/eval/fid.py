"""Frechet Inception Distance (rFID) — streaming statistics + FID math.

Replaces torchmetrics FrechetInceptionDistance (reference model.py:497,
536-541: recon/real images converted to uint8, features from pool3 of
InceptionV3). The feature extractor is pluggable:

- ``load_inception_extractor()`` returns a jitted InceptionV3 pool3 feature
  fn when converted weights are available (tools/convert_inception_weights.py
  — FID is only comparable across implementations with the standard
  pt_inception weights), else None.
- Any callable ``(uint8 NHWC images) -> (B, D) features`` works, so tests
  exercise the statistics math with toy extractors.

The Frechet distance uses the eigen-decomposition form
``tr(S1) + tr(S2) - 2 tr((S1^(1/2) S2 S1^(1/2))^(1/2))`` computed on the host
in float64 — identical math to the usual scipy.linalg.sqrtm route without the
scipy dependency.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Callable, Optional

import numpy as np


class FIDAccumulator:
    """Streaming mean/second-moment of feature vectors for one distribution."""

    def __init__(self, feature_dim: int):
        self.n = 0
        self.sum = np.zeros((feature_dim,), np.float64)
        self.outer = np.zeros((feature_dim, feature_dim), np.float64)

    def update(self, features: np.ndarray, mask: Optional[np.ndarray] = None):
        features = np.asarray(features, np.float64)
        if mask is not None:
            features = features[np.asarray(mask, bool)]
        self.n += features.shape[0]
        self.sum += features.sum(axis=0)
        self.outer += features.T @ features

    def reduce_across_hosts(self, allsum):
        """Merge per-host partial sums (multi-host eval)."""
        self.n = int(allsum(np.asarray(self.n)))
        self.sum = np.asarray(allsum(self.sum))
        self.outer = np.asarray(allsum(self.outer))

    def stats(self):
        assert self.n > 1, "need at least 2 samples for covariance"
        mu = self.sum / self.n
        # unbiased covariance (matches torchmetrics / pytorch-fid)
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FD between two gaussians (Heusel et al. 2017)."""
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(cov1)
    inner = _sqrtm_psd(s1_half @ cov2 @ s1_half)
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(inner))


class FID:
    """Two-distribution streaming FID (real vs fake), torchmetrics-style API."""

    def __init__(self, extractor: Callable, feature_dim: int):
        self.extractor = extractor
        self.real = FIDAccumulator(feature_dim)
        self.fake = FIDAccumulator(feature_dim)

    def update(self, images_uint8: np.ndarray, real: bool,
               mask: Optional[np.ndarray] = None):
        feats = np.asarray(self.extractor(images_uint8))
        (self.real if real else self.fake).update(feats, mask)

    def reduce_across_hosts(self, allsum):
        self.real.reduce_across_hosts(allsum)
        self.fake.reduce_across_hosts(allsum)

    def compute(self) -> float:
        mu_r, cov_r = self.real.stats()
        mu_f, cov_f = self.fake.stats()
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)


def inception_weights_path() -> Path:
    env = os.environ.get("VQVAE_TPU_INCEPTION_WEIGHTS")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "vqvae_tpu" / "inception_fid.npz"


def load_inception_extractor():
    """(extractor, feature_dim) with converted FID-inception weights, or
    (None, 0) when unavailable."""
    path = inception_weights_path()
    if not path.exists():
        warnings.warn(
            f"FID inception weights not found at {path}; rFID will be skipped. "
            "Run tools/convert_inception_weights.py to enable it.")
        return None, 0
    from vqvae_tpu.eval.inception import make_pool3_extractor
    return make_pool3_extractor(path), 2048
