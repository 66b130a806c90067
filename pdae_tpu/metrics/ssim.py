"""SSIM with the reference's exact construction: 11x11 gaussian window
(sigma 1.5), per-channel depthwise convolution, computed on [0,1]-scaled
images (``/root/reference/metric/utils.py:26-57``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseMetric


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """x: [N,H,W,C]; per-channel 'same' conv with the gaussian window."""
    c = x.shape[-1]
    k = jnp.asarray(window)[:, :, None, None]          # HWIO, I=1
    k = jnp.tile(k, (1, 1, 1, c))                      # one filter per channel
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         size_average: bool = True):
    """SSIM over [0,1] NHWC batches; per-image values if not size_average."""
    w = _gaussian_window(window_size, sigma)
    mu1 = _depthwise_blur(img1, w)
    mu2 = _depthwise_blur(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, w) - mu12
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


class SSIMMetric(BaseMetric):
    """Per-sample SSIM accumulation (reference metric/ssim_metric.py)."""

    def process(self, images: np.ndarray, gts: np.ndarray):
        """images/gts: [N,H,W,C] in [0,1]."""
        vals = np.asarray(ssim(jnp.asarray(images), jnp.asarray(gts),
                               size_average=False))
        self.results.extend(float(v) for v in vals)
