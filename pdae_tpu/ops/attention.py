"""Fused spatial self-attention Pallas kernel for TPU.

The UNet's AttentionBlock operates on flattened spatial tokens (T <= 4096
for the model families here: 8x8..64x64 maps).  This kernel fuses
QK^T -> softmax -> PV in one VMEM-resident pass per (batch, head) tile --
no HBM round-trips for the [T, T] logits, which is where the XLA fallback
spends its bandwidth (reference math: /root/reference/model/module.py:431-488;
scale 1/sqrt(sqrt(ch)) applied to both q and k, fp32 softmax).

Usage: ``fused_qkv_attention(q, k, v)`` with [B, H, T, D] inputs.  Falls
back to the jnp einsum path automatically off-TPU or for awkward shapes;
wire-up in models/blocks.py is controlled by ``pdae_tpu.ops.use_pallas``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def reference_attention(q, k, v, scale):
    """jnp fallback, identical math ([B,H,T,D])."""
    logits = jnp.einsum("bhtd,bhsd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", weights.astype(v.dtype), v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # refs are [T, D] tiles for one (batch, head) program
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32) * scale
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [T, T]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v_ref.dtype)
    o_ref[:] = jax.lax.dot_general(
        w, v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _supported(q) -> bool:
    if not _PALLAS_OK:
        return False
    b, h, t, d = q.shape
    # whole [T, T] fp32 logits tile must fit VMEM (~16MB/core): t=1024 ->
    # 4MB. The UNet families here have T <= 256 (128px at ds=8) anyway.
    return t <= 1024 and d <= 256


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention(q, k, v, interpret: bool = False):
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(math.sqrt(d))
    # flatten (batch, head) into the row axis; each grid step owns a 2D
    # [t, d] tile (Mosaic-friendly -- no 3D memref slicing)
    qf = q.reshape(b * h * t, d)
    kf = k.reshape(b * h * t, d)
    vf = v.reshape(b * h * t, d)

    spec = pl.BlockSpec((t, d), lambda i: (i, 0))
    kernel = functools.partial(_attn_kernel, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h * t, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


@jax.custom_vjp
def _attention_core(q, k, v):
    """Pallas forward; jnp backward (standard attention VJP) so training
    differentiates through the fused kernel."""
    return _pallas_attention(q, k, v)


def _attention_core_fwd(q, k, v):
    return _pallas_attention(q, k, v), (q, k, v)


def _attention_core_bwd(res, g):
    q, k, v = res
    d = q.shape[-1]
    s2 = 1.0 / math.sqrt(d)          # (1/d^0.25)^2 applied to q AND k
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * s2
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gv = g.astype(jnp.float32)
    dv = jnp.einsum("bhts,bhtd->bhsd", w, gv)
    dw = jnp.einsum("bhtd,bhsd->bhts", gv, v.astype(jnp.float32))
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bhsd->bhtd", dl, k.astype(jnp.float32)) * s2
    dk = jnp.einsum("bhts,bhtd->bhsd", dl, q.astype(jnp.float32)) * s2
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_qkv_attention(q, k, v, interpret: bool = False):
    """[B, H, T, D] multi-head attention, Pallas on TPU, jnp elsewhere.
    Differentiable: custom VJP with an XLA backward pass."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    on_tpu = jax.default_backend() == "tpu"
    if interpret and _supported(q):
        return _pallas_attention(q, k, v, interpret=interpret)
    if on_tpu and _supported(q):
        return _attention_core(q, k, v)
    return reference_attention(q, k, v, scale)
