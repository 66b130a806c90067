"""ShiftUNet: the PDAE decoder -- a frozen pre-trained UNet plus a parallel
trainable gradient branch.

Structural equivalent of ``/root/reference/model/shift_unet.py``: the frozen
trunk (``time_embed``, ``input_blocks``, ``middle_block``, ``output_blocks``,
``out``) shares its parameter tree layout with :class:`pdae_tpu.models.UNet`,
while the trainable branch adds ``label_emb`` (Linear latent->time_emb),
``shift_middle_block``/``shift_output_blocks`` (ResBlockShift stages) and
``shift_out``.  The encoder trunk runs ONCE and both decode paths consume the
same stored skip activations (reference shift_unet.py:266-284); the forward
returns ``(epsilon, gradient)``.

Freezing is functional: :func:`pdae_tpu.training.partition.shift_unet_trainable`
partitions the param pytree so the optimizer only touches the shift branch --
the jax equivalent of ``requires_grad_(False)`` (shift_unet.py:299-310).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..parallel import constrain_spatial
from .blocks import (TimeEmbedMLP, conv3x3, group_norm, timestep_embedding,
                     zeros_init)
from .unet import apply_stage, build_trunk

# Parameter-tree prefixes of the trainable PDAE branch; everything else is
# the frozen pre-trained DPM (reference shift_unet.py:287-310).
SHIFT_TRAINABLE_PREFIXES = ("label_emb", "shift_middle_block",
                            "shift_output_blocks", "shift_out_norm",
                            "shift_out_conv")


class ShiftUNet(nn.Module):
    input_channel: int
    base_channel: int
    channel_multiplier: Sequence[int]
    num_residual_blocks_of_a_block: int
    attention_resolutions: Sequence[int]
    latent_dim: int
    num_heads: int = 1
    head_channel: int = -1
    use_new_attention_order: bool = False
    dropout: float = 0.0
    learn_sigma: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        time_embed_dim = self.base_channel * 4
        self.time_embed = TimeEmbedMLP(time_embed_dim, dtype=self.dtype)
        # trainable latent embedding: Linear(latent_dim -> time_embed_dim)
        self.label_emb = nn.Dense(time_embed_dim, dtype=self.dtype)

        args = (self.base_channel, self.channel_multiplier,
                self.num_residual_blocks_of_a_block,
                self.attention_resolutions, self.num_heads, self.head_channel,
                self.use_new_attention_order, self.dropout,
                self.input_channel, self.dtype)
        # frozen trunk + epsilon decoder (identical tree layout to UNet)
        (self.input_blocks, self.middle_block, self.output_blocks,
         final_ch, _input_ch) = build_trunk(*args, shift=False)
        # trainable shift decoder (same geometry, ResBlockShift conditioning)
        (_same_inputs, self.shift_middle_block, self.shift_output_blocks,
         _ch2, _ic2) = build_trunk(*args, shift=True)

        output_channel = (self.input_channel * 2 if self.learn_sigma
                          else self.input_channel)
        self.out_norm = group_norm(final_ch, self.dtype)
        self.out_conv = conv3x3(output_channel, dtype=self.dtype,
                                kernel_init=zeros_init)
        self.shift_out_norm = group_norm(final_ch, self.dtype)
        self.shift_out_conv = conv3x3(self.input_channel, dtype=self.dtype,
                                      kernel_init=zeros_init)

    def __call__(self, x, time, condition, deterministic: bool = True,
                 shift_deterministic=None):
        """``condition`` is the semantic latent z [N, latent_dim].
        Returns ``(predicted_noise, gradient)``.

        ``deterministic`` governs the FROZEN trunk/epsilon decoder;
        ``shift_deterministic`` (default: follows ``deterministic``) governs
        only the trainable shift branch -- PDAE training keeps the frozen
        modules in eval mode while the shift branch trains with dropout
        (reference shift_unet.py:287-310 set_train_mode/freeze).
        """
        if shift_deterministic is None:
            shift_deterministic = deterministic
        emb = self.time_embed(timestep_embedding(time, self.base_channel))
        shift_emb = self.label_emb(condition.astype(self.dtype))

        hs = []
        # spatial-parallel hints as in unet.py: H-sharded activations on an
        # [data, sp] mesh, identity everywhere else
        h = constrain_spatial(x.astype(self.dtype))
        for stage in self.input_blocks:
            h = constrain_spatial(
                apply_stage(stage, h, emb, deterministic=deterministic))
            # remat-policy tag (see unet.py): with ``remat: skips`` the
            # trunk skips are saved, so the PDAE backward recompute is the
            # shift branch only -- the frozen trunk is never re-run and
            # the epsilon decode path is DCE'd (no gradient flows there).
            h = checkpoint_name(h, "unet_skip")
            hs.append(h)

        epsilon_h = constrain_spatial(
            apply_stage(self.middle_block, h, emb,
                        deterministic=deterministic))
        shift_h = constrain_spatial(
            apply_stage(self.shift_middle_block, h, emb, shift_emb,
                        deterministic=shift_deterministic))

        for stage, shift_stage in zip(self.output_blocks,
                                      self.shift_output_blocks):
            h_previous = hs.pop()
            epsilon_h = jnp.concatenate([epsilon_h, h_previous], axis=-1)
            epsilon_h = constrain_spatial(
                apply_stage(stage, epsilon_h, emb,
                            deterministic=deterministic))
            shift_h = jnp.concatenate([shift_h, h_previous], axis=-1)
            shift_h = constrain_spatial(
                apply_stage(shift_stage, shift_h, emb, shift_emb,
                            deterministic=shift_deterministic))

        epsilon = self.out_conv(nn.silu(self.out_norm(epsilon_h)))
        gradient = self.shift_out_conv(nn.silu(self.shift_out_norm(shift_h)))
        return epsilon.astype(jnp.float32), gradient.astype(jnp.float32)
