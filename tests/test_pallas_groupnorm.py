"""Fused GroupNorm+AdaGN+SiLU kernel vs the XLA reference composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.ops.groupnorm import (_gn_core_bwd, _pallas_gn,
                                    fused_gn_adagn_silu,
                                    reference_gn_adagn_silu)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32),
                                          ((1, 16, 16, 32), 8),
                                          ((3, 4, 4, 128), 32)])
def test_pallas_gn_matches_reference(shape, groups):
    rs = np.random.RandomState(0)
    b, h, w, c = shape
    x = jnp.asarray(rs.randn(*shape).astype(np.float32))
    gn_scale = jnp.asarray(rs.randn(c).astype(np.float32))
    gn_bias = jnp.asarray(rs.randn(c).astype(np.float32))
    scale = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)
    shift = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)
    zs = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)
    zb = jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1)
    want = np.asarray(reference_gn_adagn_silu(
        x, gn_scale, gn_bias, scale, shift, zs, zb, groups))
    got = np.asarray(_pallas_gn(x, gn_scale, gn_bias, scale, shift, zs, zb,
                                groups, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_plain_resblock_variant_no_z():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 64).astype(np.float32))
    c = 64
    gn_scale = jnp.ones(c); gn_bias = jnp.zeros(c)
    scale = jnp.zeros((2, c)); shift = jnp.zeros((2, c))
    out = fused_gn_adagn_silu(x, gn_scale, gn_bias, scale, shift,
                              groups=32, interpret=True)
    want = reference_gn_adagn_silu(x, gn_scale, gn_bias, scale, shift,
                                   jnp.zeros((2, c)), jnp.zeros((2, c)), 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_backward_matches_reference():
    rs = np.random.RandomState(2)
    b, h, w, c, groups = 2, 4, 4, 32, 8
    args = (
        jnp.asarray(rs.randn(b, h, w, c).astype(np.float32)),
        jnp.asarray(rs.randn(c).astype(np.float32)),
        jnp.asarray(rs.randn(c).astype(np.float32)),
        jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1),
        jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1),
        jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1),
        jnp.asarray(rs.randn(b, c).astype(np.float32) * 0.1),
    )

    def loss_ref(*a):
        return jnp.sum(jnp.cos(reference_gn_adagn_silu(*a, groups=groups)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    # the custom bwd differentiates the reference composition directly
    g_core = _gn_core_bwd(groups, args,
                          -jnp.sin(reference_gn_adagn_silu(*args,
                                                           groups=groups)))
    for a, b_ in zip(g_core, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)
