"""Fused nearest-upsample-2x + 3x3 conv as one lhs-dilated convolution.

The up-ResBlocks in the UNet decoders compute ``conv3x3(up2(h))``
(reference module.py:143-172 Upsample and :205-297 ResBlock ``up=True``).
Materialising ``up2(h)`` costs an HBM round-trip of the 4x-larger tensor
(forward ``broadcast_in_dim`` + backward ``reduce_sum`` -- the 128px
train-step cost model attributes ~8% of cycles to exactly these pairs,
PERF.md "128px train breakdown"), and the 3x3 conv then re-multiplies
each input pixel 4 times under different taps.

Identity used here: nearest-up-2x is zero-stuffing (``lhs_dilation=2``)
followed by a 2x2 box filter, so

    conv3x3_same(up2(x))  ==  conv_general_dilated(
        x, k4, lhs_dilation=(2,2), padding=((2,2),(2,2)))

with the 4x4 kernel ``k4[t,s] = sum_{a,b in {0,1}} k3[t-a, s-b]`` (the
full 2-D convolution of the 3x3 kernel with the 2x2 box).  Exact in real
arithmetic; in bf16 the pre-summed taps reassociate the accumulation
(parity-tested in tests/test_fused_upsample.py).  The fused form does
16 taps over the ZERO-STUFFED grid -- only 4 land on data per output --
vs 9 taps over the duplicated grid: 2.25x fewer MACs, no 4x intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def derive_k4(k3: jnp.ndarray) -> jnp.ndarray:
    """[3,3,I,O] -> [4,4,I,O]: full 2-D convolution with the 2x2 box.

    Computed in fp32 regardless of input dtype (params are fp32; the sum
    of two taps must not round before the compute-dtype cast)."""
    k3 = k3.astype(jnp.float32)
    k4 = jnp.zeros((4, 4) + k3.shape[2:], jnp.float32)
    for a in (0, 1):
        for b in (0, 1):
            k4 = k4.at[a:a + 3, b:b + 3].add(k3)
    return k4


def fused_upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """``conv3x3_same(nearest_up_2x(x)) + bias`` as one conv.

    ``x``: NHWC, ``kernel``: [3,3,I,O] (HWIO, the ordinary conv3x3
    param -- derivation to 4x4 happens here, so checkpoints are
    unchanged), ``bias``: [O].  ``dtype``: compute dtype (defaults to
    ``x.dtype``)."""
    dtype = dtype or x.dtype
    k4 = derive_k4(kernel).astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k4,
        window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)
