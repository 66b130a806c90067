"""Fused GroupNorm + AdaGN + SiLU Pallas kernel.

The ResBlock epilogue ``silu((1+z_scale)*(GN(h)*(1+scale)+shift)+z_shift)``
(reference module.py:287-295, 377-381) costs XLA two HBM passes over the
activation (stats reduction + normalize).  This kernel computes the
group statistics and the whole affine/SiLU chain in one VMEM-resident pass
per batch element.

Trick for Mosaic-friendly group stats without reshaping the lane dim:
per-channel sums (VPU reduce over rows) are aggregated per group with a
tiny [C, G] one-hot matmul, and group stats broadcast back with its
transpose.

Training uses a custom VJP whose backward differentiates the identical
XLA reference composition (fused forward, XLA backward).

Measured on v5e (64x64x128, batch 16): 1.5x faster than XLA at fp32
(494us vs 741us); at bf16 XLA's fused chain is faster (the kernel
accumulates in fp32), so models (which run bf16) keep the XLA path and
this op is exposed for fp32 pipelines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

EPS = 1e-5  # torch GroupNorm default (module.py:56-63 parity)


def reference_gn_adagn_silu(x, gn_scale, gn_bias, scale, shift, z_scale,
                            z_shift, groups: int):
    """XLA reference: x [B,H,W,C]; scale/shift/z_* [B,C] (or None-like
    zeros); returns silu((1+z_scale)*(GN(x)*(1+scale)+shift)+z_shift)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + EPS)).reshape(b, h, w, c)
    y = y * gn_scale + gn_bias
    y = y * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    y = (1.0 + z_scale[:, None, None, :]) * y + z_shift[:, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _kernel(x_ref, a_ref, b_ref, o_ref, *, groups: int, rows: int):
    """x [rows, C]; a/b [8, C] (row-replicated per-batch affine coefs:
    the whole GN-affine + AdaGN chain folds into y = GN_norm*a + b)."""
    c = x_ref.shape[-1]
    cs = c // groups
    x = x_ref[:].astype(jnp.float32)                  # [rows, C]
    # one-hot [C, G] group map
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch // cs == gr).astype(jnp.float32)
    n = rows * cs
    # two-pass stats (VMEM-resident, so the extra pass is free of HBM
    # traffic): one-pass E[x^2]-mean^2 loses ~1e-2 accuracy at 16k elements
    s1 = jnp.sum(x, axis=0, keepdims=True)            # [1, C]
    hi = jax.lax.Precision.HIGHEST
    gs1 = jnp.dot(s1, m, preferred_element_type=jnp.float32,
                  precision=hi)                      # [1, G]
    mean_g = gs1 / n
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32,
                     precision=hi)
    d = x - mean_c
    s2 = jnp.sum(d * d, axis=0, keepdims=True)
    gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32,
                  precision=hi)
    inv_g = jax.lax.rsqrt(gs2 / n + EPS)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32,
                    precision=hi)

    a = a_ref[0:1, :].astype(jnp.float32)
    bb = b_ref[0:1, :].astype(jnp.float32)
    y = d * inv_c * a + bb
    o_ref[:] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def _pallas_gn(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
               groups: int, interpret: bool = False):
    b, h, w, c = x.shape
    rows = h * w
    xf = x.reshape(b * rows, c)
    # fold the affine chain into per-(batch, channel) A/B in XLA (tiny):
    #   y1 = n*gs + gb;  y2 = y1*(1+s) + t;  y3 = (1+zs)*y2 + zb
    #   => y3 = n*A + B with A = gs*(1+s)*(1+zs),
    #      B = (gb*(1+s) + t)*(1+zs) + zb
    s1 = (1.0 + scale.astype(jnp.float32))
    zs1 = (1.0 + z_scale.astype(jnp.float32))
    A = gn_scale.astype(jnp.float32)[None, :] * s1 * zs1
    B = ((gn_bias.astype(jnp.float32)[None, :] * s1
          + shift.astype(jnp.float32)) * zs1 + z_shift.astype(jnp.float32))
    # replicate to 8 rows for Mosaic block-shape constraints
    A8 = jnp.broadcast_to(A[:, None, :], (b, 8, c)).reshape(b * 8, c)
    B8 = jnp.broadcast_to(B[:, None, :], (b, 8, c)).reshape(b * 8, c)

    row_spec = pl.BlockSpec((rows, c), lambda i: (i, 0))
    ab_spec = pl.BlockSpec((8, c), lambda i: (i, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, groups=groups, rows=rows),
        grid=(b,),
        in_specs=[row_spec, ab_spec, ab_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b * rows, c), x.dtype),
        interpret=interpret,
    )(xf, A8, B8)
    return out.reshape(b, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _gn_core(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
             groups: int):
    return _pallas_gn(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                      groups)


def _gn_core_fwd(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                 groups):
    out = _pallas_gn(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                     groups)
    return out, (x, gn_scale, gn_bias, scale, shift, z_scale, z_shift)


def _gn_core_bwd(groups, res, g):
    _, vjp = jax.vjp(
        lambda *a: reference_gn_adagn_silu(*a, groups=groups), *res)
    return vjp(g)


_gn_core.defvjp(_gn_core_fwd, _gn_core_bwd)


def _supported(x, groups: int) -> bool:
    if not _PALLAS_OK:
        return False
    b, h, w, c = x.shape
    # the [rows, C] tile must fit VMEM (fp32 accumulation)
    return h * w * c * 4 <= 8 * 1024 * 1024 and c % groups == 0


def fused_gn_adagn_silu(x, gn_scale, gn_bias, scale, shift, z_scale=None,
                        z_shift=None, groups: int = 32,
                        interpret: bool = False):
    """silu((1+z_scale)*(GN(x)*(1+scale)+shift)+z_shift), fused on TPU.

    ``scale/shift/z_*``: [B, C]; pass z_* = None for the plain ResBlock.
    """
    b, c = x.shape[0], x.shape[-1]
    if (z_scale is None) != (z_shift is None):
        raise ValueError("z_scale and z_shift must be both set (double "
                         "AdaGN) or both None (plain ResBlock); got "
                         f"z_scale={'set' if z_scale is not None else None}, "
                         f"z_shift={'set' if z_shift is not None else None}")
    if z_scale is None:
        z_scale = jnp.zeros((b, c), x.dtype)
        z_shift = jnp.zeros((b, c), x.dtype)
    on_tpu = jax.default_backend() == "tpu"
    if interpret and _supported(x, groups):
        return _pallas_gn(x, gn_scale, gn_bias, scale, shift, z_scale,
                          z_shift, groups, interpret=True)
    if on_tpu and _supported(x, groups):
        return _gn_core(x, gn_scale, gn_bias, scale, shift, z_scale,
                        z_shift, groups)
    return reference_gn_adagn_silu(x, gn_scale, gn_bias, scale, shift,
                                   z_scale, z_shift, groups)
