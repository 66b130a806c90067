"""Closed-form stat-caching GN(+AdaGN)+SiLU VJP (ops/groupnorm_train.py).

The training chain's backward is replaced by a hand-derived gradient that
reuses the forward statistics (the generic-autodiff graph re-reduces
them, 26% of train-step device time in round 2 -- PERF.md).  These tests
pin (a) forward equality with the eval-chain reference composition,
(b) gradient equality with generic autodiff for every input, at fp32 and
bf16, with and without the AdaGN terms, (c) the blocks.GNSiluChain
module's param-tree compatibility with nn.GroupNorm, and (d) the ops
flag plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu import ops
from pdae_tpu.ops.groupnorm import reference_gn_adagn_silu
from pdae_tpu.ops.groupnorm_train import (gn_adagn_silu_inline,
                                          gn_adagn_silu_train)


def _inputs(dtype, b=3, h=8, w=8, c=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (b, h, w, c), dtype)
    gs = jax.random.normal(ks[1], (c,), jnp.float32) * 0.2 + 1.0
    gb = jax.random.normal(ks[2], (c,), jnp.float32) * 0.2
    vecs = [jax.random.normal(k, (b, c), dtype) * 0.3 for k in ks[3:7]]
    cot = jax.random.normal(ks[7], (b, h, w, c), dtype)
    return x, gs, gb, vecs, cot


@pytest.mark.parametrize("groups", [32, 16, 1])
def test_forward_matches_eval_reference(groups):
    x, gs, gb, (sc, sh, zs, zt), _ = _inputs(jnp.float32)
    got = gn_adagn_silu_train(x, gs, gb, sc, sh, zs, zt, groups)
    want = reference_gn_adagn_silu(x, gs, gb, sc, sh, zs, zt, groups)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4),
                                       (jnp.bfloat16, 3e-2)])
@pytest.mark.parametrize("with_adagn", [True, False])
def test_closed_vjp_matches_autodiff(dtype, tol, with_adagn):
    x, gs, gb, (sc, sh, zs, zt), cot = _inputs(dtype)
    if not with_adagn:
        sc = sh = zs = zt = jnp.zeros_like(sc)

    def grads(fn):
        def loss(*a):
            return jnp.sum(fn(*a, 32).astype(jnp.float32)
                           * cot.astype(jnp.float32))
        return jax.grad(loss, argnums=tuple(range(7)))(
            x, gs, gb, sc, sh, zs, zt)

    g1 = grads(gn_adagn_silu_train)
    g2 = grads(gn_adagn_silu_inline)
    for name, a, b in zip(
            ["dx", "dgn_scale", "dgn_bias", "dscale", "dshift",
             "dz_scale", "dz_shift"], g1, g2):
        a32, b32 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(float(np.max(np.abs(b32))), 1.0)
        np.testing.assert_allclose(a32, b32, atol=tol * scale,
                                   err_msg=name)
        assert a.dtype == b.dtype, name


def test_gn_silu_chain_param_tree_matches_group_norm():
    """blocks.GNSiluChain must occupy the exact nn.GroupNorm param slot
    (checkpoints + torch converter mapping depend on it)."""
    from flax import linen as nn

    from pdae_tpu.models.blocks import GNSiluChain, group_norm

    x = jnp.ones((2, 4, 4, 32))
    p_chain = GNSiluChain(32, name="in_norm").init(
        jax.random.PRNGKey(0), x)["params"]
    p_gn = group_norm(32, name="in_norm").init(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_chain) == \
        jax.tree_util.tree_structure(p_gn)
    for a, b in zip(jax.tree_util.tree_leaves(p_chain),
                    jax.tree_util.tree_leaves(p_gn)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # and the forward equals GN+silu
    out = GNSiluChain(32).apply({"params": p_chain}, x)
    want = nn.silu(group_norm(32).apply({"params": p_gn}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flag_plumbing():
    old = ops._GN_TRAIN_VJP
    try:
        ops.set_gn_train_vjp(True)
        assert ops.use_gn_train_vjp() is True
        ops.set_gn_train_vjp(False)
        assert ops.use_gn_train_vjp() is False
        ops.set_gn_train_vjp(None)
        assert ops.use_gn_train_vjp() == (jax.default_backend() == "tpu")
    finally:
        ops.set_gn_train_vjp(old)


def test_chain_grads_flow_in_resblock_shift():
    """End-to-end through ResBlockShift with the custom VJP forced on:
    grads exist for GN affine params and both AdaGN Dense layers, and
    match the flag-off backward."""
    from pdae_tpu.models.blocks import ResBlockShift

    m = ResBlockShift(channels=32, emb_channels=16, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    emb_z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    params = m.init(jax.random.PRNGKey(3), x, emb, emb_z)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x, emb, emb_z) ** 2)

    old = ops._GN_TRAIN_VJP
    try:
        ops.set_gn_train_vjp(True)
        g_on = jax.grad(loss)(params)
        ops.set_gn_train_vjp(False)
        g_off = jax.grad(loss)(params)
    finally:
        ops.set_gn_train_vjp(old)
    flat_on = jax.tree_util.tree_leaves_with_path(g_on)
    flat_off = jax.tree_util.tree_leaves(g_off)
    assert any("out_norm" in jax.tree_util.keystr(kp) for kp, _ in flat_on)
    for (kp, a), b in zip(flat_on, flat_off):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=jax.tree_util.keystr(kp))
