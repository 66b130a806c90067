"""Training-path GroupNorm+AdaGN+SiLU chain with a controlled backward.

The eval-chain Pallas kernel (``ops/groupnorm.py``) was ruled out for bf16
models; this module attacks the TRAINING cost instead: 26% of train-step
device time is GroupNorm-stat ``convert_reduce_fusion`` HBM passes
(fwd+bwd) and another 6% is GN backward reduces (PERF.md op-class table).

Reference counterpart being beaten: per-op ``nn.GroupNorm`` inside every
ResBlock (``/root/reference/model/module.py:56-63,287-295,377-381``),
whose autograd backward re-reduces statistics.

Design: ``gn_adagn_silu_train`` is a ``jax.custom_vjp`` over the exact
composition ``silu((1+z_scale)*(GN(x)*gn_scale+gn_bias)*(1+scale)... ``
(the affine chain folds to ``y = xhat*A + B``):

* forward: the SAME XLA ops as the inline composition (so XLA still fuses
  the stats reduce into the producing conv's epilogue); the only extras
  saved are ``mean``/``rsqrt`` at [B, G] -- a few KB.
* backward: closed-form GN gradient from the saved stats -- the
  statistics are NEVER re-reduced.  One elementwise recompute of
  ``xhat``/``y`` from the saved ``x`` feeds all five reduction outputs
  (dA, dB over spatial; the two per-group moments) and ``dx`` in a single
  dataflow XLA can schedule as two passes over (x, g), vs the generic
  autodiff graph's larger residual set and reduce chain.

Variance uses the one-pass ``E[x^2] - E[x]^2`` form to match
``flax.linen.GroupNorm(use_fast_variance=True)``, which is what
``models/blocks.py`` computed before this op existed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-5  # torch GroupNorm default (reference module.py:56-63 parity)


def _fold_affine(gn_scale, gn_bias, scale, shift, z_scale, z_shift):
    """Fold GN affine + AdaGN + shift-AdaGN into y = xhat*A + B.

    gn_scale/gn_bias: [C]; scale/shift/z_*: [B, C].  All fp32."""
    s1 = 1.0 + scale
    zs1 = 1.0 + z_scale
    A = gn_scale[None, :] * s1 * zs1
    B = (gn_bias[None, :] * s1 + shift) * zs1 + z_shift
    return A, B


def _stats(x32, groups):
    """One-pass group stats: mean, rsqrt(var+eps), both [B, G]."""
    b, h, w, c = x32.shape
    xg = x32.reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3))
    mean2 = jnp.mean(jnp.square(xg), axis=(1, 3))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + EPS)


def _per_channel(stat_bg, groups, c):
    """[B, G] -> [B, 1, 1, C] broadcast helper."""
    b = stat_bg.shape[0]
    return jnp.repeat(stat_bg, c // groups, axis=1).reshape(b, 1, 1, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def gn_adagn_silu_train(x, gn_scale, gn_bias, scale, shift, z_scale,
                        z_shift, groups: int):
    """silu((1+z_scale)*(GN(x)*(1+scale)+shift)+z_shift) with a
    closed-form, stat-caching backward.  x [B,H,W,C] (any float dtype,
    math in fp32); gn_scale/gn_bias [C]; scale/shift/z_* [B, C]."""
    out, _ = _fwd(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                  groups)
    return out


def _fwd(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift, groups):
    # EXACTLY the pre-existing composition's op/dtype sequence (flax
    # nn.GroupNorm: fp32 stats + fp32 normalize/affine, cast to the
    # compute dtype, THEN the AdaGN chain and silu in the compute dtype).
    # An earlier draft folded the whole affine chain into fp32
    # y = xhat*A + B -- algebraically identical, but it cost the SAMPLING
    # path 9% (XLA materialized the folded [B,1,1,C] broadcasts and ran
    # the fused elementwise loops at fp32 width); the fold now lives only
    # in the backward, where it is what enables the stat-caching math.
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    mean, inv = _stats(x32, groups)
    xhat = (x32 - _per_channel(mean, groups, c)) * _per_channel(
        inv, groups, c)
    y = (xhat * gn_scale + gn_bias).astype(x.dtype)
    y = y * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    y = (1.0 + z_scale[:, None, None, :]) * y + z_shift[:, None, None, :]
    out = y * jax.nn.sigmoid(y)
    # residuals: x plus tiny per-(B,G)/(B,C) vectors -- generic autodiff
    # would also keep a [B,H,W,C] intermediate (xhat or y) alive
    return out, (x, mean, inv, gn_scale, gn_bias, scale, shift, z_scale,
                 z_shift)


def _bwd(groups, res, g):
    x, mean, inv, gn_scale, gn_bias, scale, shift, z_scale, z_shift = res
    b, h, w, c = x.shape
    cs = c // groups
    n = h * w * cs

    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    gs32 = gn_scale.astype(jnp.float32)
    gb32 = gn_bias.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    zs32 = z_scale.astype(jnp.float32)
    zt32 = z_shift.astype(jnp.float32)

    mean_c = _per_channel(mean, groups, c)
    inv_c = _per_channel(inv, groups, c)
    xhat = (x32 - mean_c) * inv_c
    A, B = _fold_affine(gs32, gb32, s32, t32, zs32, zt32)
    y = xhat * A[:, None, None, :] + B[:, None, None, :]

    # silu'(y) = sig(y) * (1 + y*(1-sig(y)))
    sig = jax.nn.sigmoid(y)
    dy = g32 * (sig * (1.0 + y * (1.0 - sig)))

    # per-(B,C) spatial reduces -- the ONLY large reductions in this
    # backward; they feed every parameter gradient AND the group moments
    dA_bc = jnp.sum(dy * xhat, axis=(1, 2))           # [B, C]
    dB_bc = jnp.sum(dy, axis=(1, 2))                  # [B, C]

    # closed-form GN input gradient: stats come from the saved residuals,
    # never re-reduced.  The per-group moments of dxhat = dy*A are exact
    # linear combinations of the per-channel reduces above --
    #   mean_g(dxhat)        = (1/n) sum_{c in g} A_c * dB_bc[:, c]
    #   mean_g(dxhat * xhat) = (1/n) sum_{c in g} A_c * dA_bc[:, c]
    # (xhat is already centered/normalized per group, so no cross terms)
    # -- which removes two more full [B,H,W,C] reduction passes that a
    # naive closed form (or generic autodiff) performs.
    dxhat = dy * A[:, None, None, :]
    m1 = jnp.sum((A * dB_bc).reshape(b, groups, cs), axis=2) / n  # [B, G]
    m2 = jnp.sum((A * dA_bc).reshape(b, groups, cs), axis=2) / n  # [B, G]
    dx = inv_c * (dxhat - _per_channel(m1, groups, c)
                  - xhat * _per_channel(m2, groups, c))

    # unfold dA/dB through A = gn_scale*(1+s)*(1+zs),
    # B = (gn_bias*(1+s)+shift)*(1+zs)+z_shift
    s1 = 1.0 + s32
    zs1 = 1.0 + zs32
    d_gn_scale = jnp.sum(dA_bc * s1 * zs1, axis=0)    # [C]
    d_gn_bias = jnp.sum(dB_bc * s1 * zs1, axis=0)     # [C]
    d_scale = dA_bc * gs32[None, :] * zs1 + dB_bc * gb32[None, :] * zs1
    d_shift = dB_bc * zs1
    d_z_scale = (dA_bc * gs32[None, :] * s1
                 + dB_bc * (gb32[None, :] * s1 + t32))
    d_z_shift = dB_bc

    def cast(v, ref):
        return v.astype(jnp.asarray(ref).dtype)

    return (dx.astype(x.dtype), cast(d_gn_scale, gn_scale),
            cast(d_gn_bias, gn_bias), cast(d_scale, scale),
            cast(d_shift, shift), cast(d_z_scale, z_scale),
            cast(d_z_shift, z_shift))


gn_adagn_silu_train.defvjp(_fwd, _bwd)


def gn_adagn_silu_inline(x, gn_scale, gn_bias, scale, shift, z_scale,
                         z_shift, groups: int):
    """The plain inline composition (generic autodiff) -- the baseline the
    custom VJP is measured against, numerically identical forward."""
    out, _ = _fwd(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                  groups)
    return out


# --------------------------------------------------------------------- #
# Pallas backward: one VMEM-resident pass over (x, g) per batch element
# --------------------------------------------------------------------- #
# The closed-form XLA backward above needs two passes over (x, g): one
# feeding the per-channel reduces, one recomputing xhat/dy for dx (the
# reduce results gate dx).  With the whole [H*W, C] slab resident in
# VMEM, the Pallas kernel does reduces AND dx in a single read --
# 3 HBM transfers (read x, read g, write dx) vs 5.

try:
    from jax.experimental import pallas as pl
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _bwd_kernel(x_ref, g_ref, a_ref, b_ref, mean_ref, inv_ref,
                dx_ref, da_ref, db_ref, *, groups: int, rows: int):
    """Per-batch-element block: x/g [rows, C]; a/b/mean/inv [8, C]
    row-replicated per-batch coefficients; outputs dx [rows, C] and the
    per-channel spatial reduces dA/dB [8, C] (row 0 valid)."""
    c = x_ref.shape[-1]
    cs = c // groups
    n = rows * cs
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    a = a_ref[0:1, :].astype(jnp.float32)
    b = b_ref[0:1, :].astype(jnp.float32)
    mean = mean_ref[0:1, :].astype(jnp.float32)
    inv = inv_ref[0:1, :].astype(jnp.float32)

    xhat = (x - mean) * inv
    y = xhat * a + b
    sig = jax.nn.sigmoid(y)
    dy = g * (sig * (1.0 + y * (1.0 - sig)))

    da = jnp.sum(dy * xhat, axis=0, keepdims=True)    # [1, C]
    db = jnp.sum(dy, axis=0, keepdims=True)           # [1, C]

    # group moments from the per-channel reduces (see _bwd): aggregate
    # with the one-hot [C, G] matmul, broadcast back with its transpose
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch // cs == gr).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    m1_g = jnp.dot(a * db, m, preferred_element_type=jnp.float32,
                   precision=hi) / n                  # [1, G]
    m2_g = jnp.dot(a * da, m, preferred_element_type=jnp.float32,
                   precision=hi) / n
    m1_c = jnp.dot(m1_g, m.T, preferred_element_type=jnp.float32,
                   precision=hi)
    m2_c = jnp.dot(m2_g, m.T, preferred_element_type=jnp.float32,
                   precision=hi)

    dx = inv * (dy * a - m1_c - xhat * m2_c)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    da_ref[:] = jnp.broadcast_to(da, (8, c)).astype(da_ref.dtype)
    db_ref[:] = jnp.broadcast_to(db, (8, c)).astype(db_ref.dtype)


def _pallas_bwd_supported(x, groups: int) -> bool:
    if not _PALLAS_OK or jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    # x + g fp32 slabs and dx must stay VMEM-resident per batch element
    return h * w * c * 4 <= 4 * 1024 * 1024 and c % groups == 0 \
        and c % 128 == 0


def _bwd_pallas(groups, res, g):
    x, mean, inv, gn_scale, gn_bias, scale, shift, z_scale, z_shift = res
    if not _pallas_bwd_supported(x, groups):
        return _bwd(groups, res, g)
    b, h, w, c = x.shape
    rows = h * w

    gs32 = gn_scale.astype(jnp.float32)
    gb32 = gn_bias.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    zs32 = z_scale.astype(jnp.float32)
    zt32 = z_shift.astype(jnp.float32)
    A, B = _fold_affine(gs32, gb32, s32, t32, zs32, zt32)   # [B, C]
    mean_c = jnp.repeat(mean, c // groups, axis=1)          # [B, C]
    inv_c = jnp.repeat(inv, c // groups, axis=1)

    def rep8(v):   # [B, C] -> [B*8, C] row-replicated (Mosaic tile rows)
        return jnp.broadcast_to(v[:, None, :], (b, 8, c)).reshape(b * 8, c)

    row_spec = pl.BlockSpec((rows, c), lambda i: (i, 0))
    coef_spec = pl.BlockSpec((8, c), lambda i: (i, 0))

    dx, da8, db8 = pl.pallas_call(
        functools.partial(_bwd_kernel, groups=groups, rows=rows),
        grid=(b,),
        in_specs=[row_spec, row_spec, coef_spec, coef_spec, coef_spec,
                  coef_spec],
        out_specs=[row_spec, coef_spec, coef_spec],
        out_shape=[jax.ShapeDtypeStruct((b * rows, c), x.dtype),
                   jax.ShapeDtypeStruct((b * 8, c), jnp.float32),
                   jax.ShapeDtypeStruct((b * 8, c), jnp.float32)],
    )(x.reshape(b * rows, c), g.reshape(b * rows, c), rep8(A), rep8(B),
      rep8(mean_c), rep8(inv_c))

    dA_bc = da8.reshape(b, 8, c)[:, 0, :]
    dB_bc = db8.reshape(b, 8, c)[:, 0, :]

    s1 = 1.0 + s32
    zs1 = 1.0 + zs32
    d_gn_scale = jnp.sum(dA_bc * s1 * zs1, axis=0)
    d_gn_bias = jnp.sum(dB_bc * s1 * zs1, axis=0)
    d_scale = dA_bc * gs32[None, :] * zs1 + dB_bc * gb32[None, :] * zs1
    d_shift = dB_bc * zs1
    d_z_scale = (dA_bc * gs32[None, :] * s1
                 + dB_bc * (gb32[None, :] * s1 + t32))
    d_z_shift = dB_bc

    def cast(v, ref):
        return v.astype(jnp.asarray(ref).dtype)

    return (dx.reshape(b, h, w, c), cast(d_gn_scale, gn_scale),
            cast(d_gn_bias, gn_bias), cast(d_scale, scale),
            cast(d_shift, shift), cast(d_z_scale, z_scale),
            cast(d_z_shift, z_shift))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def gn_adagn_silu_train_pallas(x, gn_scale, gn_bias, scale, shift,
                               z_scale, z_shift, groups: int):
    """Same chain as ``gn_adagn_silu_train`` but with the backward as a
    single-pass Pallas kernel (XLA closed-form fallback off-TPU or when
    the slab exceeds VMEM)."""
    out, _ = _fwd(x, gn_scale, gn_bias, scale, shift, z_scale, z_shift,
                  groups)
    return out


gn_adagn_silu_train_pallas.defvjp(_fwd, _bwd_pallas)
