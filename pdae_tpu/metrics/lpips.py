"""LPIPS perceptual distance (AlexNet backbone), flax/NHWC.

The reference uses the ``lpips`` package with the AlexNet backbone
(``/root/reference/metric/lpips_metric.py:11``).  Re-implemented here:
AlexNet conv stack -> features at the 5 ReLU stages -> per-channel unit
normalization -> learned 1x1 linear weights -> spatial mean -> sum over
stages.  Inputs are [-1, 1] NHWC images, scaled by the standard LPIPS
shift/scale buffers.

Weights: this environment cannot download the pretrained AlexNet + LPIPS
linear weights; convert them once from the torch ``lpips`` package with
``scripts/convert_torch_checkpoint.py --lpips lpips.ckpt`` and pass the
file.  ``available(path)`` gates callers (metrics are skipped with a clear
message when absent).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import BaseMetric

# standard LPIPS input normalization buffers
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature geometry: (out_ch, kernel, stride, pad) per conv
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}     # maxpool(3,2) after relu of conv1 and conv2
_CHANNELS = [64, 192, 384, 256, 256]


def _conv(x, w, b, stride, pad):
    # w: HWIO
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b[None, None, None, :]


def _maxpool32(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, 0), (0, 0), (0, 0)])


def _alexnet_features(params, x):
    feats = []
    h = x
    for i in range(5):
        h = _conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"],
                  _ALEX[i][2], _ALEX[i][3])
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool32(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(params, img1, img2):
    """img1/img2: [-1,1] NHWC.  Returns per-image LPIPS [N]."""
    shift = jnp.asarray(_SHIFT)[None, None, None, :]
    scale = jnp.asarray(_SCALE)[None, None, None, :]
    x1 = (img1 - shift) / scale
    x2 = (img2 - shift) / scale
    f1 = _alexnet_features(params, x1)
    f2 = _alexnet_features(params, x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        lin = params[f"lin{i}_w"]            # [C] non-negative weights
        val = jnp.sum(d * lin[None, None, None, :], axis=-1)
        total = total + jnp.mean(val, axis=(1, 2))
    return total


def available(path: Optional[str]) -> bool:
    return bool(path) and os.path.exists(path)


def load_params(path: str):
    from ..utils import load_checkpoint
    raw = load_checkpoint(path)
    return {k: jnp.asarray(v) for k, v in raw.items()}


class LPIPSMetric(BaseMetric):
    """Per-sample LPIPS accumulation (reference metric/lpips_metric.py).
    Requires converted weights; see module docstring."""

    def __init__(self, weights_path: str):
        super().__init__()
        # params as jit args, not closure constants (see CLAUDE.md)
        self.params = jax.device_put(load_params(weights_path))
        self._fn = jax.jit(lpips_distance)

    def process(self, images: np.ndarray, gts: np.ndarray):
        """images/gts in [0,1]; rescaled to [-1,1] here.  Numerically
        identical to the reference path, which feeds the RAW [-1,1]
        tensors straight to lpips.LPIPS(net='alex') with its default
        normalize=False (autoencoding_eval.py:88,
        metric/lpips/lpips_metric.py:12-15)."""
        a = jnp.asarray(images) * 2.0 - 1.0
        b = jnp.asarray(gts) * 2.0 - 1.0
        vals = np.asarray(self._fn(self.params, a, b))
        self.results.extend(float(v) for v in vals)
