"""Fused upsample-conv under the sharded layouts.

``ops.use_fused_upsample()`` is auto-on for TPU only, so the CPU-mesh
sharding suites (test_sp.py, test_tp.py) exercise the UN-fused up path
by default -- yet on real TPU pods SP/TP run WITH the fused lhs-dilated
conv (the shipped 128px configuration, PERF.md "128px train breakdown").
These tests force the toggle on and re-prove the two properties that
could plausibly break under GSPMD partitioning of an lhs-dilated conv:

* SP: the H-sharded fused conv still compiles to halo
  collective-permutes (not a gather), stays degradation-free, and
  matches the replicated loss/grads bit-for-tolerance;
* TP: the end-to-end trainer trajectory with channel-sharded params
  (the 4x4 kernel is DERIVED in-graph from the sharded 3x3 param)
  equals the replicated run.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pdae_tpu import ops
from pdae_tpu.models import UNet
from pdae_tpu.parallel import (make_sp_mesh, spmd_degradation_check)
from pdae_tpu.training import RegularDiffusionTrainer
from pdae_tpu.utils import init_key

from test_training_regular import TINY_CONFIG


@pytest.fixture
def fused_on():
    ops.set_fused_upsample(True)
    yield
    ops.set_fused_upsample(None)


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _tiny_unet():
    return UNet(input_channel=1, base_channel=8, channel_multiplier=(1, 2),
                num_residual_blocks_of_a_block=1, attention_resolutions=(2,),
                num_heads=1, head_channel=-1, use_new_attention_order=False,
                dropout=0.0)


def test_sp_halo_and_grad_equality_with_fused_upsample(fused_on):
    """H-sharded fwd+bwd through the lhs-dilated fused conv: the compiled
    HLO must contain BOTH the dilated conv (proof the fused branch is the
    one executing) and halo collective-permutes (proof GSPMD kept it
    H-sharded), with replicated-equal loss and grads."""
    m = _tiny_unet()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 16, 1),
                    jnp.float32)
    t = jnp.zeros((8,), jnp.int32)
    params = jax.jit(m.init)(init_key(0), x, t)["params"]

    def loss_fn(p, x, t):
        return jnp.mean(m.apply({"params": p}, x, t) ** 2)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(params, x, t)

    mesh = make_sp_mesh(2)   # data 4 x sp 2
    repl = NamedSharding(mesh, P())
    pr = jax.device_put(params, repl)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(t, NamedSharding(mesh, P("data")))
    with spmd_degradation_check(), mesh:
        g = jax.jit(jax.value_and_grad(loss_fn),
                    out_shardings=(repl, repl))
        txt = g.lower(pr, xs, ts).compile().as_text()
        assert "lhs_dilate=2x2" in txt, "fused upsample conv not in HLO"
        assert "collective-permute" in txt, "no halo exchange in HLO"
        loss, grads = g(pr, xs, ts)
        jax.block_until_ready(loss)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(_leaves(grads), _leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_tp_trainer_matches_replicated_with_fused_upsample(fused_on,
                                                           tmp_path):
    """Channel-sharded params: derive_k4 traces over a model-axis-sharded
    [3,3,I,O] leaf; the trainer trajectory must equal the replicated
    run (same bounds as test_tp.py)."""
    cfg_tp = copy.deepcopy(TINY_CONFIG)
    cfg_tp["runner_config"]["param_sharding"] = "tp"
    cfg_tp["runner_config"]["tp_size"] = 2
    # tiny test model: let even small leaves shard (as test_tp.py does)
    cfg_tp["runner_config"]["fsdp_min_size"] = 256
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr_tp = RegularDiffusionTrainer(config=cfg_tp,
                                    run_path=str(tmp_path / "tp"))
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_tp.state.params))
    tr_rep.train(max_steps=4)
    tr_tp.train(max_steps=4)
    for a, b in zip(_leaves(tr_rep.state.params),
                    _leaves(tr_tp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_fsdp_tp_trainer_matches_replicated_with_fused_upsample(fused_on,
                                                                tmp_path):
    """Composed mode (verdict r4 #5): the 3x3 kernel leaf is sharded over
    BOTH axes (channel dim on 'model', largest remaining on 'data') and
    derive_k4 must still trace over it; trajectory equals replicated."""
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "fsdp+tp"
    cfg["runner_config"]["tp_size"] = 2
    cfg["runner_config"]["fsdp_min_size"] = 256
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr_ft = RegularDiffusionTrainer(config=cfg,
                                    run_path=str(tmp_path / "ft"))
    # at least one leaf must actually be sharded over the model axis
    axes_per_leaf = [
        {a for e in l.sharding.spec if e is not None
         for a in (e if isinstance(e, tuple) else (e,))}
        for l in _leaves(tr_ft.state.params)]
    assert any("model" in a for a in axes_per_leaf)
    tr_rep.train(max_steps=4)
    tr_ft.train(max_steps=4)
    for a, b in zip(_leaves(tr_rep.state.params),
                    _leaves(tr_ft.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
