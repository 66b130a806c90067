"""NN building blocks for the diffusion UNets, flax/NHWC/TPU-native.

Functional equivalents of the reference blocks
(``/root/reference/model/module.py``): GroupNorm(32) normalization, sinusoidal
timestep embedding, ResBlock with AdaGN ``GN(h)*(1+scale)+shift``
(module.py:287-295), ResBlockShift with the double AdaGN
``(1+z_scale)*(GN(h)*(1+s)+b)+z_shift`` (module.py:377-381), spatial
self-attention with both head-split orders (module.py:431-488), and
nearest-neighbour up/down sampling.

TPU-first choices: NHWC layout (XLA:TPU's native conv layout), fp32 params
with configurable bf16 compute via the ``dtype`` attribute, softmax in fp32,
explicit (1,1) conv padding so geometry matches the torch reference for
checkpoint conversion.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# GroupNorm(32) with torch eps for numeric parity (module.py:56-63).
# For real configs channels are multiples of 32; smaller channel counts
# (tiny test models) fall back to the largest divisor <= 32.
def num_groups(channels: int) -> int:
    groups = min(32, channels)
    while channels % groups != 0:
        groups -= 1
    return groups


def group_norm(channels: int, dtype=jnp.float32, name=None):
    return nn.GroupNorm(num_groups=num_groups(channels), epsilon=1e-5,
                        dtype=dtype, name=name)


class GNSiluChain(nn.Module):
    """GroupNorm(+AdaGN)+SiLU ResBlock epilogue with a controlled
    backward.  Param-compatible with ``nn.GroupNorm`` (same ``scale``/
    ``bias`` leaves under the same name), so checkpoints and the torch
    converter mapping are unchanged.  When ``ops.use_gn_train_vjp()`` is
    on (auto: TPU) the chain runs through the stat-caching closed-form
    VJP (``ops/groupnorm_train.py``) -- identical forward ops, backward
    never re-reduces the group statistics; otherwise the inline
    composition with generic autodiff.

    ``scale``/``shift``/``z_scale``/``z_shift``: optional [B, C] AdaGN
    coefficients (reference module.py:287-295 single, :377-381 double)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale=None, shift=None, z_scale=None,
                 z_shift=None):
        gs = self.param("scale", nn.initializers.ones, (self.channels,),
                        jnp.float32)
        gb = self.param("bias", nn.initializers.zeros, (self.channels,),
                        jnp.float32)
        from ..ops import (gn_adagn_silu_inline, gn_adagn_silu_train,
                           use_gn_train_vjp)
        b, c = x.shape[0], x.shape[-1]
        zeros = jnp.zeros((b, c), x.dtype)
        args = (x, gs, gb,
                zeros if scale is None else scale,
                zeros if shift is None else shift,
                zeros if z_scale is None else z_scale,
                zeros if z_shift is None else z_shift,
                num_groups(self.channels))
        if use_gn_train_vjp():
            return gn_adagn_silu_train(*args)
        return gn_adagn_silu_inline(*args)


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, [cos | sin] layout (module.py:66-84)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def conv3x3(features, stride=1, dtype=jnp.float32, name=None,
            kernel_init=None):
    kw = {}
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    return nn.Conv(features, (3, 3), strides=(stride, stride),
                   padding=((1, 1), (1, 1)), dtype=dtype, name=name, **kw)


def conv1x1(features, dtype=jnp.float32, name=None, kernel_init=None):
    kw = {}
    if kernel_init is not None:
        kw["kernel_init"] = kernel_init
    return nn.Conv(features, (1, 1), dtype=dtype, name=name, **kw)


zeros_init = nn.initializers.zeros


class TimeEmbedMLP(nn.Module):
    """Two-layer SiLU MLP on the sinusoidal embedding (unet.py:50-55)."""
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="dense_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.out_dim, dtype=self.dtype, name="dense_1")(emb)
        return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class FusedUpsampleConv3x3(nn.Module):
    """``conv3x3(nearest_up_2x(x))`` as one lhs-dilated conv.

    Param-compatible with ``nn.Conv(features, (3,3))`` (same ``kernel``
    [3,3,I,O] / ``bias`` leaves, same init), so checkpoints and the
    torch-converter mapping are unchanged; the 4x4 dilated kernel is
    derived at trace time (ops/upsample_conv.py).  Used by the up-blocks
    when ``ops.use_fused_upsample()`` -- kills the 4x-larger nearest-up
    intermediate (fwd broadcast / bwd reduce_sum HBM round-trips) and
    does 2.25x fewer MACs on this conv."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        from ..ops import fused_upsample_conv3x3
        return fused_upsample_conv3x3(x, kernel, bias, self.dtype)


def _up_conv3x3(features, dtype, name, x=None):
    """conv3x3-after-nearest-up, fused when the ops toggle is on (in
    auto mode the static batch of ``x`` gates the small-batch latency
    regime out -- ops.use_fused_upsample).  Returns a module applied to
    the PRE-upsample tensor when fused, so callers pass
    ``(pre_up, already_upsampled)`` and pick.  Both forms share the
    param tree (kernel/bias, identical init), so the choice never
    affects checkpoints."""
    from ..ops import use_fused_upsample
    if use_fused_upsample(None if x is None else x.shape[0]):
        return FusedUpsampleConv3x3(features, dtype=dtype, name=name), True
    return conv3x3(features, dtype=dtype, name=name), False


class Upsample(nn.Module):
    """2x nearest upsample with optional 3x3 conv (module.py:143-172)."""
    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            conv, fused = _up_conv3x3(self.out_channels or self.channels,
                                      self.dtype, "conv", x)
            return conv(x if fused else upsample_nearest_2x(x))
        return upsample_nearest_2x(x)


class Downsample(nn.Module):
    """2x downsample via stride-2 conv or avg-pool (module.py:175-202)."""
    channels: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv3x3(self.out_channels or self.channels, stride=2,
                           dtype=self.dtype, name="op")(x)
        assert (self.out_channels or self.channels) == self.channels
        return avg_pool_2x(x)


class ResBlock(nn.Module):
    """Residual block with AdaGN time conditioning (module.py:205-297).

    out = skip(x) + zero_conv(drop(silu(GN(h)*(1+scale)+shift)))
    where (scale, shift) come from the time embedding.
    """
    channels: int
    emb_channels: int
    dropout: float
    out_channels: Optional[int] = None
    use_conv: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = GNSiluChain(self.channels, self.dtype, name="in_norm")(x)
        if self.up:
            x = upsample_nearest_2x(x)
            conv, fused = _up_conv3x3(out_ch, self.dtype, "in_conv", h)
            h = conv(h if fused else upsample_nearest_2x(h))
        else:
            if self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = conv3x3(out_ch, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(2 * out_ch, dtype=self.dtype,
                           name="emb_dense")(nn.silu(emb))
        scale, shift = jnp.split(emb_out, 2, axis=-1)

        h = GNSiluChain(out_ch, self.dtype, name="out_norm")(h, scale,
                                                             shift)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(out_ch, dtype=self.dtype, name="out_conv",
                    kernel_init=zeros_init)(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = conv3x3(out_ch, dtype=self.dtype, name="skip_conv")(x)
        else:
            skip = conv1x1(out_ch, dtype=self.dtype, name="skip_conv")(x)
        return skip + h


class ResBlockShift(nn.Module):
    """PDAE conditioning block: double AdaGN (module.py:299-384).

    h = (1 + z_scale) * (GN(h)*(1+scale)+shift) + z_shift
    with (scale, shift) from the time embedding and (z_scale, z_shift)
    from the latent embedding.
    """
    channels: int
    emb_channels: int
    dropout: float
    out_channels: Optional[int] = None
    use_conv: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, emb_z, deterministic: bool = True):
        out_ch = self.out_channels or self.channels

        h = GNSiluChain(self.channels, self.dtype, name="in_norm")(x)
        if self.up:
            x = upsample_nearest_2x(x)
            conv, fused = _up_conv3x3(out_ch, self.dtype, "in_conv", h)
            h = conv(h if fused else upsample_nearest_2x(h))
        else:
            if self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = conv3x3(out_ch, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(2 * out_ch, dtype=self.dtype,
                           name="emb_dense")(nn.silu(emb))
        emb_z_out = nn.Dense(2 * out_ch, dtype=self.dtype,
                             name="emb_z_dense")(nn.silu(emb_z))
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        z_scale, z_shift = jnp.split(emb_z_out, 2, axis=-1)

        h = GNSiluChain(out_ch, self.dtype, name="out_norm")(
            h, scale, shift, z_scale, z_shift)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(out_ch, dtype=self.dtype, name="out_conv",
                    kernel_init=zeros_init)(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = conv3x3(out_ch, dtype=self.dtype, name="skip_conv")(x)
        else:
            skip = conv1x1(out_ch, dtype=self.dtype, name="skip_conv")(x)
        return skip + h


def qkv_attention(qkv: jnp.ndarray, num_heads: int,
                  new_order: bool) -> jnp.ndarray:
    """Multi-head self-attention over flattened spatial tokens.

    ``qkv``: [B, T, 3C].  The two layouts mirror the reference's
    QKVAttentionLegacy (heads-major, module.py:431-457) and QKVAttention
    (qkv-major, module.py:460-488); both use scale 1/sqrt(sqrt(ch)) applied
    to q AND k, and fp32 softmax.
    """
    b, t, w = qkv.shape
    assert w % (3 * num_heads) == 0, (w, num_heads)
    ch = w // (3 * num_heads)
    if new_order:
        qkv = qkv.reshape(b, t, 3, num_heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        qkv = qkv.reshape(b, t, num_heads, 3, ch)
        q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]

    from ..ops import fused_qkv_attention, use_pallas
    from ..ops.attention import reference_attention
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))  # -> [B,H,T,D]
    if use_pallas():
        out = fused_qkv_attention(q, k, v)
    else:
        # ONE copy of the numerically sensitive math (scale on both q and
        # k, fp32 softmax) -- shared with the Pallas kernel's reference
        out = reference_attention(q, k, v, 1.0 / math.sqrt(math.sqrt(ch)))
    return out.transpose(0, 2, 1, 3).reshape(b, t, num_heads * ch)


class AttentionBlock(nn.Module):
    """Spatial self-attention block (module.py:387-428).

    GN -> Dense(3C) qkv -> MHA -> zero-init Dense proj -> residual.
    ``head_channel == -1`` selects ``num_heads`` heads, otherwise
    ``channels // head_channel`` heads.
    """
    channels: int
    num_heads: int = 1
    head_channel: int = -1
    use_new_attention_order: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.head_channel == -1:
            heads = self.num_heads
        else:
            assert self.channels % self.head_channel == 0
            heads = self.channels // self.head_channel

        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(
            group_norm(c, self.dtype, name="norm")(tokens))
        a = qkv_attention(qkv, heads, self.use_new_attention_order)
        a = nn.Dense(c, dtype=self.dtype, name="proj_out",
                     kernel_init=zeros_init)(a)
        return (tokens + a).reshape(b, h, w, c)
