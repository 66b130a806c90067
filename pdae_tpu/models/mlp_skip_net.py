"""MLPSkipNet: the DiffAE-style MLP denoiser for the latent DPM.

Equivalent of ``/root/reference/model/mlp_skip_net.py``: ``num_layers``
blocks, the input z concatenated (skip) into every hidden layer, time
conditioning via per-layer scale ``h * (1 + cond)`` followed by LayerNorm,
kaiming-normal init for SiLU layers (mlp_skip_net.py:114-121).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import timestep_embedding

# torch kaiming_normal_(nonlinearity='relu'): N(0, sqrt(2/fan_in))
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MLPLNAct(nn.Module):
    """One block: Linear -> (xscale time-cond) -> LayerNorm -> act -> dropout
    (reference mlp_skip_net.py:82-141)."""
    out_channels: int
    norm: bool
    use_cond: bool
    activation: str  # "silu" | "none"
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond=None, deterministic: bool = True):
        init = kaiming_normal if self.activation == "silu" else (
            nn.linear.default_kernel_init)
        x = nn.Dense(self.out_channels, dtype=self.dtype, kernel_init=init,
                     name="linear")(x)
        if self.use_cond:
            c = nn.silu(cond) if self.activation == "silu" else cond
            c = nn.Dense(self.out_channels, dtype=self.dtype,
                         kernel_init=init, name="linear_emb")(c)
            x = x * (1.0 + c)
        if self.norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.activation == "silu":
            x = nn.silu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MLPSkipNet(nn.Module):
    """Latent denoiser ``f(z_t, t) -> eps`` (reference mlp_skip_net.py:6-79)."""
    input_channel: int
    model_channel: int = 2048
    num_layers: int = 10
    time_emb_channel: int = 64
    use_norm: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, condition=None, deterministic: bool = True):
        temb = timestep_embedding(t, self.time_emb_channel)
        cond = nn.Dense(self.input_channel, dtype=self.dtype,
                        name="time_embed_0")(temb)
        cond = nn.silu(cond)
        cond = nn.Dense(self.input_channel, dtype=self.dtype,
                        name="time_embed_1")(cond)

        skip_layers = set(range(1, self.num_layers))
        h = x.astype(self.dtype)
        for i in range(self.num_layers):
            if i == 0:
                act, norm, use_cond, drop = "silu", self.use_norm, True, self.dropout
                out = self.model_channel
            elif i == self.num_layers - 1:
                act, norm, use_cond, drop = "none", False, False, 0.0
                out = self.input_channel
            else:
                act, norm, use_cond, drop = "silu", self.use_norm, True, self.dropout
                out = self.model_channel
            if i in skip_layers:
                h = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)
            h = MLPLNAct(out, norm=norm, use_cond=use_cond, activation=act,
                         dropout=drop, dtype=self.dtype,
                         name=f"layers_{i}")(h, cond, deterministic)
        return h.astype(jnp.float32)
