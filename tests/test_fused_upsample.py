"""Fused nearest-up-2x + conv3x3 (ops/upsample_conv.py) parity.

The fused lhs-dilated conv must be numerically interchangeable with the
literal ``conv3x3(nearest_up_2x(x))`` composition the up-blocks use
(reference module.py:143-172, :205-297 with ``up=True``) -- same param
tree, same forward values, same gradients -- because the toggle is a
runtime perf knob, not a model change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu import ops
from pdae_tpu.models.blocks import (ResBlock, ResBlockShift, Upsample,
                                    upsample_nearest_2x)
from pdae_tpu.ops import fused_upsample_conv3x3
from pdae_tpu.utils import init_key

pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)


@pytest.fixture
def toggle():
    """Restore the tri-state fused-upsample toggle after the test."""
    yield ops.set_fused_upsample
    ops.set_fused_upsample(None)


def _reference(x, k, b):
    y = upsample_nearest_2x(x)
    y = jax.lax.conv_general_dilated(
        y, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def test_op_matches_composition_fp32():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 7, 5, 6), jnp.float32)   # odd H/W too
    k = jnp.asarray(rs.randn(3, 3, 6, 4) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(4), jnp.float32)
    got = fused_upsample_conv3x3(x, k, b)
    want = _reference(x, k, b)
    assert got.shape == (2, 14, 10, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_op_matches_composition_bf16():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 8, 8, 8), jnp.bfloat16)
    k = jnp.asarray(rs.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(8), jnp.float32)
    got = np.asarray(fused_upsample_conv3x3(x, k, b).astype(jnp.float32))
    want = np.asarray(_reference(x.astype(jnp.bfloat16),
                                 k.astype(jnp.bfloat16),
                                 b.astype(jnp.bfloat16)).astype(jnp.float32))
    # bf16 tap pre-summation reassociates the accumulation: ~1e-2 rel
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def _run_module(mod, args, toggle_val, toggle, params=None):
    toggle(toggle_val)
    try:
        if params is None:
            params = jax.jit(mod.init)(init_key(0), *args)["params"]
        out = mod.apply({"params": params}, *args)
    finally:
        toggle(None)
    return params, out


@pytest.mark.parametrize("module", ["upsample", "resblock", "resshift"])
def test_modules_toggle_equivalent(module, toggle):
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    emb = jnp.asarray(rs.randn(2, 12), jnp.float32)
    z = jnp.asarray(rs.randn(2, 12), jnp.float32)
    if module == "upsample":
        mod, args = Upsample(16, use_conv=True), (x,)
    elif module == "resblock":
        mod, args = ResBlock(16, 12, 0.0, up=True), (x, emb)
    else:
        mod, args = ResBlockShift(16, 12, 0.0, up=True), (x, emb, z)

    p_off, out_off = _run_module(mod, args, False, toggle)
    p_on, out_on = _run_module(mod, args, True, toggle, params=p_off)
    # identical param tree (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(p_off)
            == jax.tree_util.tree_structure(p_on))
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               rtol=1e-5, atol=1e-5)


def test_gradients_toggle_equivalent(toggle):
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 8, 16), jnp.float32)
    emb = jnp.asarray(rs.randn(2, 12), jnp.float32)
    mod = ResBlock(16, 12, 0.0, up=True)
    toggle(False)
    params = jax.jit(mod.init)(init_key(0), x, emb)["params"]

    def loss(p, on):
        toggle(on)
        try:
            return jnp.sum(mod.apply({"params": p}, x, emb) ** 2)
        finally:
            toggle(None)

    g_off = jax.grad(lambda p: loss(p, False))(params)
    g_on = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_off),
                    jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_auto_mode_batch_gate(monkeypatch):
    """Auto mode (toggle None) gates on the static batch: fused only on
    TPU at batch >= _FUSED_UPSAMPLE_MIN_BATCH.  Chip-measured reason: at
    b1 @64px the lhs-dilated conv is ~7% SLOWER than up+conv (PERF.md
    "128px train breakdown" addendum), while b>=8 wins everywhere.
    True/False force the choice regardless of batch (the tests above and
    real small-batch TPU pods rely on that)."""
    assert ops._FUSED_UPSAMPLE is None  # auto (the toggle fixture resets)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert ops.use_fused_upsample() is True          # no batch info
    assert ops.use_fused_upsample(1) is False        # latency regime
    assert ops.use_fused_upsample(ops._FUSED_UPSAMPLE_MIN_BATCH - 1) is False
    assert ops.use_fused_upsample(ops._FUSED_UPSAMPLE_MIN_BATCH) is True
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert ops.use_fused_upsample(64) is False       # never auto-on off-TPU
    ops.set_fused_upsample(True)
    try:
        assert ops.use_fused_upsample(1) is True     # force wins
    finally:
        ops.set_fused_upsample(None)
    ops.set_fused_upsample(False)
    try:
        assert ops.use_fused_upsample(64) is False
    finally:
        ops.set_fused_upsample(None)


def test_auto_mode_gates_on_per_shard_batch(monkeypatch):
    """Under an active data-parallel mesh the auto gate divides the
    trace-site (GLOBAL) batch by the mesh's data degree: a global batch
    of 32 on an 8-chip data mesh is 4 per chip -- the small-batch regime
    the gate exists to avoid (advisor round-4 finding)."""
    import numpy as np
    from jax.sharding import Mesh

    from pdae_tpu.parallel import make_tp_mesh

    assert ops._FUSED_UPSAMPLE is None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    with mesh:
        assert ops._ambient_data_degree() == 8
        assert ops.use_fused_upsample(32) is False    # 4 per chip
        assert ops.use_fused_upsample(64) is True     # 8 per chip
        assert ops.use_fused_upsample() is True       # no batch info
    # tp mesh: batch shards over 'data' only (model axis replicates it)
    tp = make_tp_mesh(2, devices=jax.devices()[:8])   # data 4 x model 2
    with tp:
        assert ops._ambient_data_degree() == 4
        assert ops.use_fused_upsample(32) is True     # 8 per chip
        assert ops.use_fused_upsample(16) is False    # 4 per chip
    # no mesh: global batch IS the per-chip batch
    assert ops.use_fused_upsample(32) is True
    # forcing still wins over the mesh-aware auto gate
    ops.set_fused_upsample(True)
    try:
        with mesh:
            assert ops.use_fused_upsample(1) is True
    finally:
        ops.set_fused_upsample(None)
