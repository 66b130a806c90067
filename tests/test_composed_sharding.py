"""Composed param-placement modes: ``fsdp+tp`` and ``fsdp+sp``.

Beyond-reference capability (SURVEY.md §2.3: the reference is DP-only).
The single-axis modes each attack ONE memory regime -- FSDP params/
opt-state, TP channels+activations, SP spatial activations.  When both
bind (large params AND large activations, e.g. 128px+ stages on small
slices), the composed modes shard params over the *data* axis of the
same 2-D mesh the activation split uses:

* ``fsdp+tp``: [data, model] mesh; each leaf channel-shards over
  'model' (Megatron rule) AND its largest remaining dim shards over
  'data' (ZeRO-3 rule) -- ``parallel.fsdp_tp_sharding``.
* ``fsdp+sp``: [data, sp] mesh; activations H-shard via the models'
  ``constrain_spatial`` hints while params/EMA/opt-state FSDP-shard
  over 'data' (implicitly replicated across each sp group, which
  shares them).

These tests run on the suite's 8-device CPU mesh and assert (a) the
composed spec rule, (b) trainer-level numerical equivalence with the
replicated mode with params really sharded over both axes (fsdp+tp)
or the data axis only (fsdp+sp), (c) checkpoint round-trips, and
(d) validation of rejected combinations.
"""

import copy
import json
import os

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pdae_tpu.parallel import (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS,
                               fsdp_tp_sharding, make_tp_mesh)
from pdae_tpu.training import RegularDiffusionTrainer

from test_training_regular import TINY_CONFIG


def _config(mode, extra=None):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = mode
    if "tp" in mode:
        cfg["runner_config"]["tp_size"] = 2
    if "sp" in mode:
        cfg["runner_config"]["sp_size"] = 2
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


def _axes(sharding):
    """Set of mesh axis names a sharding's spec uses."""
    axes = set()
    for entry in sharding.spec:
        if entry is None:
            continue
        axes.update(entry if isinstance(entry, (tuple, list)) else [entry])
    return axes


def _spec_axes(leaf):
    return _axes(leaf.sharding)


def test_fsdp_tp_spec_selection():
    mesh = make_tp_mesh(2)  # 8 devices -> [data:4, model:2]
    # conv kernel: channels over 'model', largest remaining dim over 'data'
    s = fsdp_tp_sharding(mesh, (3, 3, 8, 16), min_size=1)
    assert s.spec == P(None, None, DATA_AXIS, MODEL_AXIS)
    # Dense in x out: both rules land on separate dims
    s = fsdp_tp_sharding(mesh, (64, 32), min_size=1)
    assert s.spec == P(DATA_AXIS, MODEL_AXIS)
    # last dim odd: the tp rule falls to dim -2 (row-parallel)
    s = fsdp_tp_sharding(mesh, (8, 9), min_size=1)
    assert s.spec == P(MODEL_AXIS, None)
    # small leaves stay replicated
    s = fsdp_tp_sharding(mesh, (17,), min_size=256)
    assert s.spec == P()
    # vector big enough for fsdp but not 2-D: fsdp-only
    s = fsdp_tp_sharding(mesh, (64,), min_size=1)
    assert s.spec == P(DATA_AXIS)


def test_fsdp_tp_trainer_matches_replicated(tmp_path):
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr = RegularDiffusionTrainer(config=_config("fsdp+tp"),
                                 run_path=str(tmp_path / "ft"))
    assert tr.mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert tr.mesh.shape[DATA_AXIS] == 4 and tr.mesh.shape[MODEL_AXIS] == 2

    axes_used = set()
    both = 0
    for l in _leaves(tr.state.params):
        a = _spec_axes(l)
        axes_used |= a
        if {DATA_AXIS, MODEL_AXIS} <= a:
            both += 1
    assert {DATA_AXIS, MODEL_AXIS} <= axes_used, axes_used
    assert both, "no param leaf sharded over BOTH axes"
    # opt state and EMA shard the same way
    assert any(DATA_AXIS in _spec_axes(l) or MODEL_AXIS in _spec_axes(l)
               for l in _leaves(tr.state.opt_state))

    tr_rep.train(max_steps=4)
    tr.train(max_steps=4)
    for a, b in zip(_leaves(tr_rep.state.params), _leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    l_rep, l_ft = _losses(str(tmp_path / "rep")), _losses(str(tmp_path / "ft"))
    assert l_rep and len(l_rep) == len(l_ft)
    np.testing.assert_allclose(l_rep, l_ft, rtol=1e-4)
    # shardings persisted across the donated steps
    assert any({DATA_AXIS, MODEL_AXIS} <= _spec_axes(l)
               for l in _leaves(tr.state.params))


def test_fsdp_sp_trainer_matches_replicated(tmp_path):
    tr_rep = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                     run_path=str(tmp_path / "rep"))
    tr = RegularDiffusionTrainer(config=_config("fsdp+sp"),
                                 run_path=str(tmp_path / "fs"))
    assert tr.mesh.axis_names == (DATA_AXIS, SPATIAL_AXIS)
    # params shard over 'data' only -- every sp group shares them
    axes_used = set()
    for l in _leaves(tr.state.params):
        axes_used |= _spec_axes(l)
    assert DATA_AXIS in axes_used and SPATIAL_AXIS not in axes_used

    tr_rep.train(max_steps=4)
    tr.train(max_steps=4)
    for a, b in zip(_leaves(tr_rep.state.params), _leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    np.testing.assert_allclose(_losses(str(tmp_path / "rep")),
                               _losses(str(tmp_path / "fs")), rtol=1e-4)


def test_fsdp_tp_checkpoint_roundtrip(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=_config("fsdp+tp"), run_path=run)
    tr.train(max_steps=3)
    tr2 = RegularDiffusionTrainer(config=_config("fsdp+tp"), run_path=run,
                                  resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(_leaves(tr.state.params), _leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored leaves land sharded again
    assert any({DATA_AXIS, MODEL_AXIS} <= _spec_axes(l)
               for l in _leaves(tr2.state.params))


def test_composed_validation(tmp_path):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["param_sharding"] = "tp+sp"
    with pytest.raises(ValueError, match="param_sharding"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "a"))
    cfg = _config("fsdp+tp", {"mesh_layout": "hier"})
    with pytest.raises(ValueError, match="hier"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "b"))
    cfg = _config("fsdp+sp", {"mesh_layout": "hier"})
    with pytest.raises(ValueError, match="hier"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "c"))
