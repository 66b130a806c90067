"""Linear attribute classifier over normalized latents
(reference trainer/train_manipulation.py:31: ``nn.Linear(512, 40)``)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class LinearClassifier(nn.Module):
    num_classes: int = 40
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_norm):
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(z_norm)

    @staticmethod
    def weight(params):
        """[num_classes, latent_dim] weight matrix, torch-layout, for the
        manipulation edit direction (gaussian_diffusion.py:440)."""
        return params["params"]["fc"]["kernel"].T
