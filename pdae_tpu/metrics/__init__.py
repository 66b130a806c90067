from .base import BaseMetric
from .fid import (FIDMetric, activation_statistics, frechet_distance,
                  inception_feature_fn, save_stats)
from .lpips import LPIPSMetric, lpips_distance
from .mse import MSEMetric, mse
from .ssim import SSIMMetric, ssim

__all__ = [
    "BaseMetric", "FIDMetric", "activation_statistics", "frechet_distance",
    "inception_feature_fn", "save_stats", "LPIPSMetric", "lpips_distance",
    "MSEMetric", "mse", "SSIMMetric", "ssim",
]
