"""Tensor-parallel (channel-sharded) parameter placement.

Beyond-reference capability: the reference has no model sharding of any
kind (SURVEY.md §2.3 — DP only).  ``runner_config.param_sharding: tp``
lays params out channel-sharded over the MODEL_AXIS of a 2-D
[data, model] mesh; GSPMD propagates the shardings through the UNet and
inserts the collectives.  Unlike FSDP (which all-gathers each param and
runs the math replicated), TP splits the *math and activations*, so it
also helps where DP/FSDP cannot: per-chip activation memory, and
small-batch work that has fewer images than chips.

These tests run on the suite's 8-device CPU mesh and assert (a) numerical
equivalence with the replicated mode, (b) shardings persist across steps
and use only the 'model' axis, (c) checkpoints round-trip, and (d) a
batch-1 forward runs sharded across chips and matches the single-device
result.
"""

import copy
import json
import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pdae_tpu.parallel import (MODEL_AXIS, make_tp_mesh, mesh_data_axes,
                               pad_shard_batch, tp_sharding)
from pdae_tpu.training import RegularDiffusionTrainer

from test_training_regular import TINY_CONFIG

pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)


def _tp_config(extra=None):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "tp"
    cfg["runner_config"]["tp_size"] = 2
    # tiny test model: let even small leaves shard
    cfg["runner_config"]["fsdp_min_size"] = 256
    if extra:
        cfg["runner_config"].update(extra)
    return cfg


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _losses(run):
    with open(os.path.join(run, "metrics.jsonl")) as f:
        return [json.loads(l)["prediction_loss"] for l in f]


def test_tp_mesh_and_spec_selection():
    mesh = make_tp_mesh(4)
    assert mesh.axis_names == ("data", MODEL_AXIS)
    assert mesh.shape["data"] == 2 and mesh.shape[MODEL_AXIS] == 4
    # batches shard over the data axis only
    assert mesh_data_axes(mesh) == ("data",)

    # conv kernel HWIO: output channels (last dim) sharded
    assert tp_sharding(mesh, (3, 3, 64, 128), min_size=256).spec == \
        P(None, None, None, MODEL_AXIS)
    # last dim not divisible: fall back to input channels (row-parallel)
    assert tp_sharding(mesh, (64, 9), min_size=256).spec == \
        P(MODEL_AXIS, None)
    # vectors and small leaves stay replicated
    assert tp_sharding(mesh, (4096,), min_size=256).spec == P()
    assert tp_sharding(mesh, (4, 4), min_size=256).spec == P()
    # nothing divisible: replicated
    assert tp_sharding(mesh, (33, 35), min_size=256).spec == P()

    with pytest.raises(ValueError, match="model_size"):
        make_tp_mesh(3)


def test_tp_pad_shard_batch_uses_data_axis_only():
    mesh = make_tp_mesh(4)   # data 2 x model 4
    x, n = pad_shard_batch(mesh, np.zeros((3, 4), np.float32))
    assert n == 3
    # padded to the DATA axis size (2 -> 4), not the full device count (8)
    assert x.shape[0] == 4


def test_tp_trainer_matches_replicated_and_persists(tmp_path):
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr_tp = RegularDiffusionTrainer(config=_tp_config(),
                                    run_path=str(tmp_path / "tp"))
    assert tr_tp.mesh.axis_names == ("data", MODEL_AXIS)
    assert tr_tp.mesh.shape["data"] == 4

    sharded = [l for l in _leaves(tr_tp.state.params)
               if not l.sharding.is_fully_replicated]
    assert sharded, "tp mode sharded nothing"
    for leaf in sharded:
        spec_axes = {a for entry in leaf.sharding.spec if entry
                     for a in ((entry,) if isinstance(entry, str)
                               else tuple(entry))}
        assert spec_axes == {MODEL_AXIS}, leaf.sharding.spec
    # EMA and adam moments shard the same way
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_tp.state.ema_params))
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_tp.state.opt_state))

    tr_rep.train(max_steps=4)
    tr_tp.train(max_steps=4)

    # sharding persists across jitted steps (out_shardings pins it)
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_tp.state.params))

    # same data stream + rng discipline -> same trajectory (reduction-order
    # noise bounds as in test_fsdp.py)
    for a, b in zip(_leaves(tr_rep.state.params), _leaves(tr_tp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    l_rep = _losses(str(tmp_path / "rep"))
    l_tp = _losses(str(tmp_path / "tp"))
    assert l_rep and len(l_rep) == len(l_tp)
    np.testing.assert_allclose(l_rep, l_tp, rtol=1e-4)


def test_tp_checkpoint_roundtrip(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=_tp_config(), run_path=run)
    tr.train(max_steps=3)
    tr2 = RegularDiffusionTrainer(config=_tp_config(), run_path=run,
                                  resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(_leaves(tr.state.params), _leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored leaves are re-sharded, not replicated
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr2.state.params))


def test_tp_batch1_forward_across_all_chips():
    """The regime DP can't touch: ONE image, all 8 chips.  Params shard
    over a pure-model mesh (data axis 1); the jitted forward runs the
    channel-split math across every device and matches the replicated
    result."""
    import jax.numpy as jnp

    from pdae_tpu.models import UNet
    from pdae_tpu.parallel import replicated, shard_tree_tp
    from pdae_tpu.utils import init_key

    m = UNet(input_channel=1, base_channel=8, channel_multiplier=(1, 2),
             num_residual_blocks_of_a_block=1, attention_resolutions=(2,),
             num_heads=1, head_channel=-1, use_new_attention_order=False,
             dropout=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 1),
                    jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(m.init)(init_key(0), x, t)["params"]

    ref = np.asarray(jax.jit(
        lambda p, x, t: m.apply({"params": p}, x, t))(params, x, t))

    mesh = make_tp_mesh(8)   # data 1 x model 8
    tp_params = shard_tree_tp(mesh, params, min_size=256)
    sharded = [l for l in _leaves(tp_params)
               if not l.sharding.is_fully_replicated]
    assert sharded, "nothing sharded at tp_size=8"
    # the leaf shards really live on different devices
    devs = {s.device for l in sharded for s in l.addressable_shards}
    assert len(devs) == 8

    xr = jax.device_put(x, replicated(mesh))
    tr_ = jax.device_put(t, replicated(mesh))
    with mesh:
        out = jax.jit(lambda p, x, t: m.apply({"params": p}, x, t))(
            tp_params, xr, tr_)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_tp_validation(tmp_path):
    cfg = _tp_config({"tp_size": 3})
    with pytest.raises(ValueError, match="model_size"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "a"))
    cfg = _tp_config({"tp_size": 2, "mesh_layout": "hier"})
    with pytest.raises(ValueError, match="hier"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "b"))


def test_tp_flagship_encoder_flatten_constraint_and_clean_compile():
    """Regression for MULTICHIP_r02's involuntary full rematerialization:
    at the FLAGSHIP encoder geometry (celeba64, latent 512), fwd+bwd under
    a [data, model] mesh must (a) carry the flatten-boundary sharding
    constraint in the lowered HLO (``parallel.constrain_batch`` in
    ``models/encoder.py``) and (b) compile with zero SPMD-degradation
    warnings (``parallel.spmd_degradation_check`` scans the partitioner's
    C++ log output, which is the ONLY place XLA reports the fallback)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from pdae_tpu.models import encoder_for_resolution
    from pdae_tpu.parallel import shard_tree_tp, spmd_degradation_check

    enc = encoder_for_resolution(64, 512)
    x = jnp.zeros((8, 64, 64, 3))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x)["params"]
    mesh = make_tp_mesh(2)   # data 4 x model 2
    tparams = shard_tree_tp(mesh, params)
    xb = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss(p, xx):
        return jnp.mean(enc.apply({"params": p}, xx) ** 2)

    with mesh:
        lowered = jax.jit(jax.value_and_grad(loss)).lower(tparams, xb)
    assert "sharding_constraint" in lowered.as_text().lower()
    with spmd_degradation_check():
        lowered.compile()


def test_spmd_guard_catches_involuntary_remat():
    """The dryrun/test guard must actually FAIL on the partitioner
    fallback, not just scroll past it (how the defect shipped inside an
    ``ok: true`` artifact in round 2).  MULTICHIP_r02's warning came from
    the FSDP dryrun flavor: the row-sharded encoder Dense kernel
    propagates a split spatial sharding into the flatten cotangent, which
    clashes with the batch sharding the conv backward wants -- XLA then
    fully replicates the tensor as "the last resort".  Rebuild that exact
    tiny FSDP train step from ``__graft_entry__.dryrun_multichip`` with
    the encoder's flatten constraint monkeypatched out: the guard must
    raise; with the constraint active the same program must be clean and
    loss-identical."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    import __graft_entry__ as g
    import pdae_tpu.models.encoder as enc_mod
    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import SemanticEncoder, ShiftUNet
    from pdae_tpu.parallel import (SpmdDegradationError, fsdp_shardings,
                                   make_mesh, replicated, shard_tree_fsdp,
                                   spmd_degradation_check)
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})
    decoder = ShiftUNet(latent_dim=16, **g.TINY_DPM)
    encoder = SemanticEncoder(16, channels=(8, 16), attn_after_stage=2)
    x = jnp.zeros((1, 16, 16, 3))
    enc_params = jax.jit(encoder.init)(init_key(0), x)["params"]
    dec_params = jax.jit(decoder.init)(
        init_key(1), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16)))["params"]
    shift_params, frozen_params = split_shift_unet(dec_params)
    tx = make_optimizer({"lr": 1e-3})
    base_step = make_representation_train_step(gd, encoder, decoder, tx)

    # partitioner warnings are emitted only on COLD compiles -- both the
    # in-memory jit cache and the PERSISTENT cache replay compiled
    # artifacts silently (a cached copy of this exact program once made
    # the raise-path vacuously fail), so salt the step with a fresh
    # constant: it lands in the HLO as a literal and changes the cache
    # fingerprint every run, guaranteeing a cold partition pass.
    import os as _os
    salt = np.float32(int.from_bytes(_os.urandom(3), "little"))

    def train_step(state, frozen, batch, rng):
        s, l = base_step(state, frozen, batch, rng)
        return s, l + jnp.float32(salt) * 0.0

    mesh = make_mesh()   # flat 8-device data mesh, as in the dryrun
    repl = replicated(mesh)
    batch = jax.device_put(
        jnp.asarray(np.random.RandomState(0).rand(16, 16, 16, 3),
                    jnp.float32) * 2 - 1,
        NamedSharding(mesh, P("data")))
    rng = jax.device_put(jax.random.PRNGKey(0), repl)

    def run():
        state = TrainState.create(
            {"encoder": enc_params, "shift": shift_params}, tx)
        state = shard_tree_fsdp(mesh, state, min_size=2 ** 12)
        frozen = shard_tree_fsdp(mesh, frozen_params, min_size=2 ** 12)
        fsh = fsdp_shardings(mesh, state, min_size=2 ** 12)
        with mesh:
            with spmd_degradation_check():
                _, l = jax.jit(train_step, out_shardings=(fsh, repl))(
                    state, frozen, batch, rng)
                jax.block_until_ready(l)
        return float(l)

    # partitioner warnings are emitted only on COLD compiles -- a
    # persistent-cache hit replays the compiled artifact silently, so the
    # cache must be off for the guard to be exercised deterministically
    orig = enc_mod.constrain_batch
    enc_mod.constrain_batch = lambda h: h
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        with pytest.raises(SpmdDegradationError,
                           match="Involuntary full rematerialization"):
            run()
        # with the constraint: clean compile of the same program
        enc_mod.constrain_batch = orig
        loss_fixed = run()
    finally:
        enc_mod.constrain_batch = orig
        jax.config.update("jax_enable_compilation_cache", True)
    assert np.isfinite(loss_fixed)


def test_tp_chunked_dispatch(tmp_path):
    """steps_per_dispatch composes with tensor parallelism (the [K, B]
    stacked batches shard dim 1 over the data axis only)."""
    cfg = _tp_config({"steps_per_dispatch": 2,
                      "save_latest_every_steps": 4,
                      "display_steps": 2,
                      "evaluate_every_steps": 1000})
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
    tr.train(max_steps=4)
    assert int(tr.state.step) == 4

    ref = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                  run_path=str(tmp_path / "ref"))
    ref.train(max_steps=4)
    for a, b in zip(_leaves(ref.state.params), _leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
