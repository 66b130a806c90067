"""FSDP (ZeRO-3-style) parameter sharding over the data axis.

Beyond-reference capability: the reference's DDP keeps a full replica of
params/EMA/optimizer state on every rank (SURVEY.md §2.3); with
``runner_config.param_sharding: fsdp`` every large leaf is sharded over
the mesh and GSPMD inserts the all-gathers/reduce-scatters.  These tests
run on the suite's 8-device CPU mesh and assert (a) numerical equivalence
with the replicated mode, (b) the sharding actually persists across
steps, and (c) checkpoints round-trip.
"""

import copy
import os

import jax
import numpy as np
import pytest

from pdae_tpu.parallel import fsdp_sharding, make_mesh
from pdae_tpu.training import RegularDiffusionTrainer

from test_training_regular import TINY_CONFIG


def _fsdp_config(extra=None):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "fsdp"
    # tiny test model: let even small leaves shard
    cfg["runner_config"]["fsdp_min_size"] = 256
    if extra:
        cfg["runner_config"].update(extra)
    return cfg


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def test_fsdp_spec_selection():
    mesh = make_mesh()
    world = mesh.devices.size
    assert world == 8
    # large leaf: largest divisible dim sharded
    s = fsdp_sharding(mesh, (3, 3, 64, 128), min_size=256)
    assert s.spec == jax.sharding.PartitionSpec(None, None, None, "data")
    # too small: replicated
    assert fsdp_sharding(mesh, (4, 4), min_size=256).spec == \
        jax.sharding.PartitionSpec()
    # no divisible dim: replicated
    assert fsdp_sharding(mesh, (33, 35), min_size=256).spec == \
        jax.sharding.PartitionSpec()


def test_fsdp_matches_replicated_and_persists(tmp_path):
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr_fsdp = RegularDiffusionTrainer(config=_fsdp_config(),
                                      run_path=str(tmp_path / "fsdp"))

    # at least one param leaf (and its adam/EMA mirrors) is actually sharded
    sharded = [l for l in _leaves(tr_fsdp.state.params)
               if not l.sharding.is_fully_replicated]
    assert sharded, "fsdp mode sharded nothing"
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_fsdp.state.ema_params))
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_fsdp.state.opt_state))

    tr_rep.train(max_steps=4)
    tr_fsdp.train(max_steps=4)

    # sharding persists across jitted steps (out_shardings pins it)
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_fsdp.state.params))

    # identical data stream + rng discipline -> same trajectory.  The first
    # step is bitwise identical; adam amplifies reduction-order noise from
    # the resharded matmuls by ~1e-5/step afterwards (measured), so bound
    # the 4-step drift loosely and require the logged losses to agree.
    for a, b in zip(_leaves(tr_rep.state.params),
                    _leaves(tr_fsdp.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    l_rep = losses(str(tmp_path / "rep"))
    l_fsdp = losses(str(tmp_path / "fsdp"))
    assert l_rep and len(l_rep) == len(l_fsdp)
    np.testing.assert_allclose(l_rep, l_fsdp, rtol=1e-4)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=_fsdp_config(), run_path=run)
    tr.train(max_steps=3)
    assert os.path.exists(os.path.join(run, "checkpoints", "latest.ckpt"))

    # resume in fsdp mode restores exactly and re-shards
    tr2 = RegularDiffusionTrainer(config=_fsdp_config(), run_path=run,
                                  resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(_leaves(tr.state.params), _leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr2.state.params))

    # a resumed fsdp checkpoint also loads in replicated mode (the layout
    # on disk is host-gathered, mode-independent)
    tr3 = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                  run_path=run, resume="latest")
    for a, b in zip(_leaves(tr.state.params), _leaves(tr3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_representation_trainer(tmp_path, monkeypatch):
    """PDAE stage under fsdp: frozen trunk sharded too, loss finite,
    frozen params bit-stable."""
    import jax.numpy as jnp

    import pdae_tpu.training.representation as rep
    from pdae_tpu.models.encoder import SemanticEncoder
    from pdae_tpu.training import RepresentationLearningTrainer

    def tiny_encoder(config, image_size=None, dtype=jnp.float32):
        return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                               attn_after_stage=2, dtype=dtype)

    monkeypatch.setattr(rep, "build_encoder", tiny_encoder)

    base = copy.deepcopy(TINY_CONFIG)
    cfg = {
        "train_dataset_config": {**base["train_dataset_config"],
                                 "latent_dim": 16},
        "eval_dataset_config": {},
        "diffusion_config": base["diffusion_config"],
        "trained_ddpm_config": {
            "denoise_fn_config": base["denoise_fn_config"]},
        "encoder_config": {"model": "CELEBA64Encoder", "latent_dim": 16},
        "decoder_config": {"model": "ShiftUNet", "latent_dim": 16},
        "dataloader_config": base["dataloader_config"],
        "optimizer_config": base["optimizer_config"],
        "runner_config": {**base["runner_config"],
                          "param_sharding": "fsdp", "fsdp_min_size": 256},
    }
    tr = RepresentationLearningTrainer(config=cfg,
                                       run_path=str(tmp_path / "run"))
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr.frozen_params))
    frozen_before = [np.asarray(l) for l in _leaves(tr.frozen_params)]
    tr.train(max_steps=2)
    assert int(tr.state.step) == 2
    for before, after in zip(frozen_before, _leaves(tr.frozen_params)):
        np.testing.assert_array_equal(before, np.asarray(after))


def test_param_sharding_validation(tmp_path):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "zero9"
    with pytest.raises(ValueError, match="param_sharding"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))


# -- hierarchical [dcn, ici] mesh ----------------------------------------- #

def test_hier_mesh_construction():
    from pdae_tpu.parallel import (DCN_AXIS, ICI_AXIS, make_hier_mesh,
                                   mesh_data_axes)
    mesh = make_hier_mesh((2, 4))
    assert mesh.axis_names == (DCN_AXIS, ICI_AXIS)
    assert mesh.shape[DCN_AXIS] == 2 and mesh.shape[ICI_AXIS] == 4
    assert mesh_data_axes(mesh) == (DCN_AXIS, ICI_AXIS)
    # single-process auto layout: one row per process
    auto = make_hier_mesh()
    assert auto.shape[DCN_AXIS] == jax.process_count()


def test_hier_fsdp_spec_shards_ici_only():
    from pdae_tpu.parallel import ICI_AXIS, make_hier_mesh
    mesh = make_hier_mesh((2, 4))
    s = fsdp_sharding(mesh, (3, 3, 64, 128), axis_name=ICI_AXIS,
                      min_size=256)
    # sharded over ici, implicitly replicated over dcn: the param
    # all-gather stays within a host row
    assert s.spec == jax.sharding.PartitionSpec(None, None, None, "ici")
    # dim must divide the ICI axis size (4), not the full device count
    s2 = fsdp_sharding(mesh, (4, 9), axis_name=ICI_AXIS, min_size=4)
    assert s2.spec == jax.sharding.PartitionSpec("ici", None)


def test_hier_fsdp_trainer_matches_flat(tmp_path):
    """FSDP over a forced 2x4 [dcn, ici] mesh: identical losses to the
    flat 8-device mesh, params sharded over ici only, and each mesh row
    (a 'host') holds a complete copy of every param -- the property that
    keeps param all-gathers off DCN in real multi-host runs."""
    tr_flat = RegularDiffusionTrainer(config=_fsdp_config(),
                                      run_path=str(tmp_path / "flat"))
    tr_hier = RegularDiffusionTrainer(
        config=_fsdp_config({"mesh_layout": "hier", "hier_shape": [2, 4]}),
        run_path=str(tmp_path / "hier"))
    assert tr_hier.mesh.axis_names == ("dcn", "ici")

    sharded = [l for l in _leaves(tr_hier.state.params)
               if not l.sharding.is_fully_replicated]
    assert sharded, "hier fsdp sharded nothing"
    for leaf in sharded:
        spec_axes = {a for entry in leaf.sharding.spec if entry
                     for a in ((entry,) if isinstance(entry, str)
                               else tuple(entry))}
        assert spec_axes == {"ici"}, leaf.sharding.spec
        # every 'host' row holds a full copy: the row's 4 devices cover
        # all shards of the leaf
        row0 = set(tr_hier.mesh.devices[0])
        covering = {tuple(s.index) for s in leaf.addressable_shards
                    if s.device in row0}
        all_idx = {tuple(s.index) for s in leaf.addressable_shards}
        assert covering == all_idx

    tr_flat.train(max_steps=4)
    tr_hier.train(max_steps=4)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    np.testing.assert_allclose(losses(str(tmp_path / "flat")),
                               losses(str(tmp_path / "hier")), rtol=1e-4)
    # sharding persisted through the pinned-out_shardings step
    assert any(not l.sharding.is_fully_replicated
               for l in _leaves(tr_hier.state.params))


def test_hier_fsdp_chunked_dispatch(tmp_path):
    """steps_per_dispatch composes with the hierarchical mesh (the [K, B]
    stacked batches shard dim 1 over both mesh axes)."""
    cfg = _fsdp_config({"mesh_layout": "hier", "hier_shape": [2, 4],
                        "steps_per_dispatch": 2,
                        "save_latest_every_steps": 4})
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
    tr.train(max_steps=4)
    assert int(tr.state.step) == 4

    ref = RegularDiffusionTrainer(config=_fsdp_config(),
                                  run_path=str(tmp_path / "ref"))
    ref.train(max_steps=4)
    for a, b in zip(_leaves(ref.state.params), _leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_mesh_layout_validation(tmp_path):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["mesh_layout"] = "diagonal"
    with pytest.raises(ValueError, match="mesh_layout"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
