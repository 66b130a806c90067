"""FID: Frechet distance between feature distributions.

The reference defines FIDMetric over InceptionV3 pool3 features with
TF-FID weights (``/root/reference/metric/fid/fid_metric.py:12-126``) but
never wires it into a sampler; here FID is a first-class metric wired into
``sampling/unconditional_sample.py``.

The Frechet distance and running-stats machinery are feature-extractor
agnostic.  The InceptionV3 feature extractor needs the TF-FID weights
(not downloadable in this environment): convert them once with
``scripts/convert_torch_checkpoint.py --inception`` and pass the file via
``inception_path``; any callable ``features(images_uint8_nhwc) -> [N, D]``
works as a drop-in (tests use a cheap projection).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg

from .base import BaseMetric


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two gaussians (reference fid_metric.py:12-61)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("non-negligible imaginary component "
                             f"{np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix (fid_metric.py compute_stats)."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def chunked_features(feature_fn, images: np.ndarray,
                     chunk: int = 64) -> np.ndarray:
    """Run a feature extractor over fixed-size chunks (last chunk padded
    by repetition, padding rows dropped).  FID sample counts are in the
    thousands: one giant InceptionV3 batch would OOM on activations, and
    per-call batch sizes would each pay a fresh 30-60s tunnel compile;
    this keeps exactly ONE compiled shape."""
    n = len(images)
    if n == 0:
        raise ValueError("no images for feature extraction")
    if n <= chunk:
        pad = chunk - n
        if pad:
            images = np.concatenate(
                [images, np.repeat(images[:1], pad, axis=0)], axis=0)
        return np.asarray(feature_fn(images))[:n]
    out = []
    for i in range(0, n, chunk):
        out.append(chunked_features(feature_fn, images[i:i + chunk], chunk))
    return np.concatenate(out, axis=0)


class FIDMetric(BaseMetric):
    """Accumulate features of generated images; compare against target
    statistics (a ``.npz`` with mu/sigma, or computed from a reference
    feature matrix)."""

    def __init__(self, feature_fn: Callable[[np.ndarray], np.ndarray],
                 target_mu: Optional[np.ndarray] = None,
                 target_sigma: Optional[np.ndarray] = None):
        super().__init__()
        self.feature_fn = feature_fn
        self.target_mu = target_mu
        self.target_sigma = target_sigma
        self.features = []

    @classmethod
    def from_stats_file(cls, feature_fn, path: str) -> "FIDMetric":
        data = np.load(path)
        return cls(feature_fn, data["mu"], data["sigma"])

    def process(self, images_uint8: np.ndarray):
        self.features.append(chunked_features(self.feature_fn, images_uint8))

    def all_gather_results(self):
        from ..parallel import gather_objects
        self.features = gather_objects(self.features)

    def set_target_from_images(self, images_uint8: np.ndarray):
        mu, sigma = activation_statistics(
            chunked_features(self.feature_fn, images_uint8))
        self.target_mu, self.target_sigma = mu, sigma

    def compute_metrics(self) -> float:
        feats = np.concatenate(self.features, axis=0)
        mu, sigma = activation_statistics(feats)
        if self.target_mu is None:
            raise ValueError("FID target statistics not set")
        return frechet_distance(mu, sigma, self.target_mu, self.target_sigma)


def save_stats(path: str, features: np.ndarray) -> None:
    mu, sigma = activation_statistics(features)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, mu=mu, sigma=sigma)


def inception_feature_fn(inception_path: Optional[str] = None):
    """InceptionV3 pool3 feature extractor (2048-d), gated on converted
    weights being available; raises with instructions otherwise."""
    if inception_path is None or not os.path.exists(inception_path or ""):
        raise FileNotFoundError(
            "TF-FID InceptionV3 weights not found; convert the reference's "
            "pt_inception weights with scripts/convert_torch_checkpoint.py "
            "--inception and pass inception_path")
    from .inception import load_inception_feature_fn
    return load_inception_feature_fn(inception_path)
