"""Semantic encoders z = Enc(x_0).

One parameterized conv stack covers every per-dataset encoder in the
reference (``/root/reference/model/representation_learning/encoder/*.py``,
which differ only in class name and stage widths): stride-2 3x3 convs with
GroupNorm(32)+SiLU pre-activations, one AttentionBlock at the 16x16 feature
map, then GN+SiLU, flatten and a Linear to ``latent_dim``.

  * 64px  (celeba64):              channels (64, 128, 128, 128), attn after
                                   stage 2 -> 4x4x128 -> Dense(512)
  * 128px (ffhq/celebahq/horse/bedroom): channels (64, 128, 256, 256, 256),
                                   attn after stage 3 -> 4x4x256 -> Dense(512)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..parallel import constrain_batch, constrain_spatial
from .blocks import AttentionBlock, conv3x3, group_norm


class SemanticEncoder(nn.Module):
    latent_dim: int
    channels: Sequence[int] = (64, 128, 128, 128)
    attn_after_stage: int = 2      # 1-based stage index with 16x16 attention
    attn_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # spatial-parallel hint (no-op off [data, sp] meshes, see unet.py)
        h = constrain_spatial(x.astype(self.dtype))
        for i, ch in enumerate(self.channels):
            if i > 0:
                h = group_norm(self.channels[i - 1], self.dtype, name=f"norm_{i}")(h)
                h = nn.silu(h)
            h = constrain_spatial(
                conv3x3(ch, stride=2, dtype=self.dtype, name=f"conv_{i}")(h))
            if (i + 1) == self.attn_after_stage:
                h = AttentionBlock(ch, num_heads=self.attn_heads,
                                   head_channel=-1,
                                   use_new_attention_order=False,
                                   dtype=self.dtype, name=f"attn_{i}")(h)
        h = group_norm(self.channels[-1], self.dtype, name="final_norm")(h)
        h = nn.silu(h)
        # flatten boundary: under a tensor-parallel mesh the conv
        # activations are channel-sharded, and [B,H,W,C] -> [B,H*W*C]
        # merges the sharded minor dim into an unshardable one -- GSPMD
        # then falls back to involuntary full rematerialization in the
        # transposed backward.  Pin both sides batch-sharded so the
        # flatten is the explicit channel all-gather point (no-op without
        # a mesh context; see parallel.constrain_batch).
        h = constrain_batch(h)
        h = h.reshape(h.shape[0], -1)
        h = constrain_batch(h)
        z = nn.Dense(self.latent_dim, dtype=self.dtype, name="final_dense")(h)
        return z.astype(jnp.float32)


def encoder_for_resolution(image_size: int, latent_dim: int,
                           dtype=jnp.float32) -> SemanticEncoder:
    """Reference per-dataset encoder geometry by input resolution."""
    if image_size == 64:
        return SemanticEncoder(latent_dim, channels=(64, 128, 128, 128),
                               attn_after_stage=2, dtype=dtype)
    if image_size == 128:
        return SemanticEncoder(latent_dim, channels=(64, 128, 256, 256, 256),
                               attn_after_stage=3, dtype=dtype)
    raise ValueError(f"no reference encoder geometry for {image_size}px")
