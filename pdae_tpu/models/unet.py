"""ADM-style diffusion UNet, flax/NHWC.

Structural equivalent of the reference UNet (``/root/reference/model/unet.py``):
timestep-embedding MLP, optional class embedding, down/mid/up stages of
ResBlocks with attention at configured downsample rates, stride-2
ResBlock downsampling, skip concatenation on the channel axis, zero-init
output conv, and ``learn_sigma`` doubling the output channels.

The trunk construction is shared with ShiftUNet (shift_unet.py) so the two
models produce identical parameter trees for the frozen part -- that is what
makes loading a pre-trained DPM checkpoint into the PDAE decoder a plain
pytree merge.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..parallel import constrain_spatial
from .blocks import (AttentionBlock, ResBlock, ResBlockShift, TimeEmbedMLP,
                     conv3x3, group_norm, timestep_embedding, zeros_init)


def build_trunk(base_channel: int, channel_multiplier: Sequence[int],
                num_residual_blocks_of_a_block: int,
                attention_resolutions: Sequence[int], num_heads: int,
                head_channel: int, use_new_attention_order: bool,
                dropout: float, input_channel: int, dtype,
                shift: bool = False):
    """Build the UNet stage lists.

    Returns ``(input_blocks, middle_block, output_blocks, final_ch,
    input_ch)`` where each *_blocks item is a list of modules applied in
    order.  With ``shift=True`` the middle/output blocks use ResBlockShift
    (the PDAE trainable branch); the layer *geometry* is identical either
    way (reference shift_unet.py:117-236 mirrors unet.py:61-169).
    """
    attn = set(attention_resolutions)
    time_embed_dim = base_channel * 4
    Res = ResBlockShift if shift else ResBlock

    def attention(ch):
        return AttentionBlock(ch, num_heads=num_heads,
                              head_channel=head_channel,
                              use_new_attention_order=use_new_attention_order,
                              dtype=dtype)

    ch = input_ch = int(channel_multiplier[0] * base_channel)
    input_blocks = [[conv3x3(ch, dtype=dtype)]]
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(channel_multiplier):
        for _ in range(num_residual_blocks_of_a_block):
            layers = [ResBlock(ch, time_embed_dim, dropout,
                               out_channels=int(mult * base_channel),
                               dtype=dtype)]
            ch = int(mult * base_channel)
            if ds in attn:
                layers.append(attention(ch))
            input_blocks.append(layers)
            input_block_chans.append(ch)
        if level != len(channel_multiplier) - 1:
            input_blocks.append([ResBlock(ch, time_embed_dim, dropout,
                                          out_channels=ch, down=True,
                                          dtype=dtype)])
            input_block_chans.append(ch)
            ds *= 2

    middle_block = [
        Res(ch, time_embed_dim, dropout, dtype=dtype),
        attention(ch),
        Res(ch, time_embed_dim, dropout, dtype=dtype),
    ]

    output_blocks = []
    for level, mult in list(enumerate(channel_multiplier))[::-1]:
        for i in range(num_residual_blocks_of_a_block + 1):
            ich = input_block_chans.pop()
            layers = [Res(ch + ich, time_embed_dim, dropout,
                          out_channels=int(base_channel * mult), dtype=dtype)]
            ch = int(base_channel * mult)
            if ds in attn:
                layers.append(attention(ch))
            if level and i == num_residual_blocks_of_a_block:
                layers.append(Res(ch, time_embed_dim, dropout,
                                  out_channels=ch, up=True, dtype=dtype))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks, ch, input_ch


def apply_stage(layers, h, emb, emb_z=None, deterministic=True):
    """Apply one stage list, dispatching on layer kind
    (equivalent of the reference's TimestepSequential, module.py:131-140)."""
    for layer in layers:
        if isinstance(layer, ResBlockShift):
            h = layer(h, emb, emb_z, deterministic=deterministic)
        elif isinstance(layer, ResBlock):
            h = layer(h, emb, deterministic=deterministic)
        elif isinstance(layer, AttentionBlock):
            h = layer(h)
        else:
            h = layer(h)
    return h


class UNet(nn.Module):
    """Regular epsilon-prediction UNet (reference unet.py:7-202).

    Inputs are NHWC; ``time`` is an int32 [N] vector on the ORIGINAL
    diffusion time axis; ``condition`` an optional [N] int class vector.
    """
    input_channel: int
    base_channel: int
    channel_multiplier: Sequence[int]
    num_residual_blocks_of_a_block: int
    attention_resolutions: Sequence[int]
    num_heads: int = 1
    head_channel: int = -1
    use_new_attention_order: bool = False
    dropout: float = 0.0
    num_class: Optional[int] = None
    learn_sigma: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        time_embed_dim = self.base_channel * 4
        self.time_embed = TimeEmbedMLP(time_embed_dim, dtype=self.dtype)
        if self.num_class is not None:
            self.label_emb = nn.Embed(self.num_class, time_embed_dim,
                                      dtype=self.dtype)
        (self.input_blocks, self.middle_block, self.output_blocks,
         final_ch, _input_ch) = build_trunk(
            self.base_channel, self.channel_multiplier,
            self.num_residual_blocks_of_a_block, self.attention_resolutions,
            self.num_heads, self.head_channel, self.use_new_attention_order,
            self.dropout, self.input_channel, self.dtype)
        output_channel = (self.input_channel * 2 if self.learn_sigma
                          else self.input_channel)
        self.out_norm = group_norm(final_ch, self.dtype)
        self.out_conv = conv3x3(output_channel, dtype=self.dtype,
                                kernel_init=zeros_init)

    def __call__(self, x, time, condition=None, deterministic: bool = True):
        emb = self.time_embed(timestep_embedding(time, self.base_channel))
        if self.num_class is not None:
            assert condition is not None
            emb = emb + self.label_emb(condition)

        hs = []
        # spatial-parallel hint: under an [data, sp] mesh the activations
        # stay H-sharded through every stage (GSPMD halo-exchange convs);
        # identity on every other mesh (parallel.constrain_spatial)
        h = constrain_spatial(x.astype(self.dtype))
        for stage in self.input_blocks:
            h = constrain_spatial(
                apply_stage(stage, h, emb, deterministic=deterministic))
            # named for remat policy `save_only_these_names("unet_skip")`:
            # under `runner_config.remat: skips` the skip activations are
            # kept and the backward recompute starts from them instead of
            # re-running the trunk (training/steps.py).  A no-op otherwise.
            h = checkpoint_name(h, "unet_skip")
            hs.append(h)
        h = constrain_spatial(
            apply_stage(self.middle_block, h, emb,
                        deterministic=deterministic))
        for stage in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = constrain_spatial(
                apply_stage(stage, h, emb, deterministic=deterministic))
        h = nn.silu(self.out_norm(h))
        return self.out_conv(h).astype(jnp.float32)
