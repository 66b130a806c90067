"""Spatial (context) parallelism: H-sharded activations.

Beyond-reference capability (SURVEY.md §2.3: the reference is DP-only).
``runner_config.param_sharding: sp`` builds a 2-D [data, sp] mesh; params
stay replicated, batches shard over 'data', and the models'
``parallel.constrain_spatial`` hints pin every NHWC activation to
``P('data', 'sp', None, None)`` so GSPMD partitions each conv spatially
with halo exchange (collective-permute of the kernel-overlap rows) and
turns GN-stat reductions into psums.  This is the axis that scales
*resolution*: at 128px+ activations dominate memory (params are ~130M but
a b32 no-remat step holds ~10s of GB of activations) and neither DP, FSDP
nor TP's channel split helps as directly.

These tests run on the suite's 8-device CPU mesh and assert (a) the
constraint helper's specs and its no-op behavior off sp meshes, (b) the
compiled fwd+bwd really contains halo collective-permutes and is free of
SPMD-degradation fallbacks, (c) trainer-level numerical equivalence with
the replicated mode, and (d) a batch-1 forward runs H-sharded across all
chips and matches the single-device result (the serving-latency regime).
"""

import copy
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pdae_tpu.models import UNet
from pdae_tpu.parallel import (SPATIAL_AXIS, constrain_spatial, make_sp_mesh,
                               mesh_data_axes, replicated,
                               spmd_degradation_check)
from pdae_tpu.training import RegularDiffusionTrainer
from pdae_tpu.utils import init_key

from test_training_regular import TINY_CONFIG


def _sp_config(extra=None):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "sp"
    cfg["runner_config"]["sp_size"] = 2
    if extra:
        cfg["runner_config"].update(extra)
    return cfg


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _losses(run):
    with open(os.path.join(run, "metrics.jsonl")) as f:
        return [json.loads(l)["prediction_loss"] for l in f]


def _tiny_unet():
    return UNet(input_channel=1, base_channel=8, channel_multiplier=(1, 2),
                num_residual_blocks_of_a_block=1, attention_resolutions=(2,),
                num_heads=1, head_channel=-1, use_new_attention_order=False,
                dropout=0.0)


def test_sp_mesh_and_constrain_specs():
    mesh = make_sp_mesh(4)
    assert mesh.axis_names == ("data", SPATIAL_AXIS)
    assert mesh.shape["data"] == 2 and mesh.shape[SPATIAL_AXIS] == 4
    # batches shard over the data axis only
    assert mesh_data_axes(mesh) == ("data",)
    with pytest.raises(ValueError, match="sp_size"):
        make_sp_mesh(3)

    # no ambient mesh: exact no-op (same object, not even a constraint op)
    x = jnp.zeros((2, 16, 16, 3))
    assert constrain_spatial(x) is x

    # under the mesh: NHWC divisible H -> [data, sp] sharding
    # (PartitionSpec normalizes trailing Nones away)
    with mesh:
        y = jax.jit(constrain_spatial)(x)
    assert y.sharding.spec == P("data", SPATIAL_AXIS)

    # H not divisible by sp size -> batch-only fallback, never an error
    xo = jnp.zeros((2, 15, 15, 3))
    with mesh:
        yo = jax.jit(constrain_spatial)(xo)
    assert yo.sharding.spec == P("data")

    # non-4D (e.g. the latent z) -> batch-only
    z = jnp.zeros((2, 8))
    with mesh:
        yz = jax.jit(constrain_spatial)(z)
    assert yz.sharding.spec == P("data")


def test_sp_fwd_bwd_halo_exchange_and_loss_equality():
    """The compiled train-style fwd+bwd must carry halo collective-permutes
    (proof the convs stayed H-sharded -- loss equality alone would also
    pass if GSPMD silently gathered everything) and compile without SPMD
    degradation; the loss must match the replicated computation."""
    m = _tiny_unet()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 16, 1), jnp.float32)
    t = jnp.zeros((8,), jnp.int32)
    params = jax.jit(m.init)(init_key(0), x, t)["params"]

    def loss_fn(p, x, t):
        return jnp.mean(m.apply({"params": p}, x, t) ** 2)

    ref = float(jax.jit(loss_fn)(params, x, t))

    mesh = make_sp_mesh(2)   # data 4 x sp 2
    repl = NamedSharding(mesh, P())
    pr = jax.device_put(params, repl)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(t, NamedSharding(mesh, P("data")))
    with spmd_degradation_check(), mesh:
        g = jax.jit(jax.value_and_grad(loss_fn),
                    out_shardings=(repl, repl))
        txt = g.lower(pr, xs, ts).compile().as_text()
        assert "collective-permute" in txt, "no halo exchange in HLO"
        loss, grads = g(pr, xs, ts)
        jax.block_until_ready(loss)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    # grads match the replicated computation too
    _, gref = jax.jit(jax.value_and_grad(loss_fn))(params, x, t)
    for a, b in zip(_leaves(grads), _leaves(gref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sp_trainer_matches_replicated(tmp_path):
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr_sp = RegularDiffusionTrainer(config=_sp_config(),
                                    run_path=str(tmp_path / "sp"))
    assert tr_sp.mesh.axis_names == ("data", SPATIAL_AXIS)
    assert tr_sp.mesh.shape["data"] == 4
    # params replicated (sp shards activations, not params)
    assert all(l.sharding.is_fully_replicated
               for l in _leaves(tr_sp.state.params))

    tr_rep.train(max_steps=4)
    tr_sp.train(max_steps=4)

    for a, b in zip(_leaves(tr_rep.state.params), _leaves(tr_sp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    l_rep = _losses(str(tmp_path / "rep"))
    l_sp = _losses(str(tmp_path / "sp"))
    assert l_rep and len(l_rep) == len(l_sp)
    np.testing.assert_allclose(l_rep, l_sp, rtol=1e-4)


def test_sp_checkpoint_roundtrip(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=_sp_config(), run_path=run)
    tr.train(max_steps=3)
    tr2 = RegularDiffusionTrainer(config=_sp_config(), run_path=run,
                                  resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(_leaves(tr.state.params), _leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_sp_batch1_forward_across_all_chips():
    """The serving regime: ONE image, all 8 chips sharing its rows.  The
    conv-dominated trunk splits by H (params replicated, no channel
    collectives in the conv path), matching the replicated result."""
    m = _tiny_unet()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(m.init)(init_key(0), x, t)["params"]
    ref = np.asarray(jax.jit(
        lambda p, x, t: m.apply({"params": p}, x, t))(params, x, t))

    mesh = make_sp_mesh(8)   # data 1 x sp 8: every chip holds 2 rows
    pr = jax.device_put(params, replicated(mesh))
    xr = jax.device_put(x, replicated(mesh))
    tr_ = jax.device_put(t, replicated(mesh))
    with mesh:
        f = jax.jit(lambda p, x, t: m.apply({"params": p}, x, t))
        out = f(pr, xr, tr_)
        txt = f.lower(pr, xr, tr_).compile().as_text()
    assert "collective-permute" in txt, "batch-1 forward not H-sharded"
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_sp_validation(tmp_path):
    cfg = _sp_config({"sp_size": 3})
    with pytest.raises(ValueError, match="sp_size"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "a"))
    cfg = _sp_config({"sp_size": 2, "mesh_layout": "hier"})
    with pytest.raises(ValueError, match="hier"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "b"))
