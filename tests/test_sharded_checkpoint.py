"""Per-process sharded checkpoints (``checkpoint_format: sharded``).

Beyond-reference capability: the reference's rank-0 ``torch.save``
(train_regular_diffusion.py:180-201) materializes the full state on one
host; our default 'full' format mirrors that (after a host gather in
sharded-param runs).  The sharded format instead writes each process's
replica-0 shards with no collective on the data path
(``pdae_tpu/utils/sharded_checkpoint.py``) -- the layout orbax/
tensorstore exist for, built from scratch on msgpack.

Covered here on the suite's 8-device CPU mesh: byte-level round-trips
of FSDP- and 2-D (fsdp+tp)-sharded trees, exactly-once coverage (each
element written by exactly one piece), loud failure on incomplete
directories, ``load_checkpoint`` format dispatch, trainer-level resume
through the sharded format in replicated and fsdp modes, and format
switching on an existing run dir.  The 2-live-process path is covered
in tests/test_multiprocess_live.py.
"""

import copy
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.parallel import (make_mesh, make_tp_mesh, fsdp_shardings,
                               fsdp_tp_shardings, shard_tree_fsdp)
from pdae_tpu.training import RegularDiffusionTrainer
from pdae_tpu.utils import (is_sharded_checkpoint, load_checkpoint,
                            load_sharded_checkpoint, save_checkpoint,
                            save_sharded_checkpoint)

from test_training_regular import TINY_CONFIG


def _tree():
    r = np.random.RandomState(0)
    return {
        "params": {
            "conv": {"kernel": r.randn(3, 3, 8, 16).astype(np.float32),
                     "bias": r.randn(16).astype(np.float32)},
            "dense": {"kernel": r.randn(64, 32).astype(np.float32)},
        },
        "step": np.asarray(7, np.int32),
        "bf16": r.randn(16, 8).astype(jnp.bfloat16),
    }


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        assert np.asarray(x).dtype == np.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fsdp_sharded_roundtrip(tmp_path):
    mesh = make_mesh()
    tree = _tree()
    placed = {
        "params": shard_tree_fsdp(mesh, tree["params"], min_size=16),
        "step": tree["step"],
        "bf16": shard_tree_fsdp(mesh, tree["bf16"], min_size=16),
    }
    assert any(not l.sharding.is_fully_replicated
               for l in jax.tree_util.tree_leaves(placed["params"]))
    d = str(tmp_path / "ckpt.sharded")
    save_sharded_checkpoint(d, placed)
    assert is_sharded_checkpoint(d)
    raw = load_sharded_checkpoint(d)
    _assert_tree_equal(tree, raw)
    # load_checkpoint dispatches on the directory form
    _assert_tree_equal(tree, load_checkpoint(d))


def test_2d_sharded_roundtrip_and_exact_coverage(tmp_path):
    mesh = make_tp_mesh(2)   # [data:4, model:2]
    tree = {"w": np.arange(64 * 32, dtype=np.float32).reshape(64, 32)}
    sh = fsdp_tp_shardings(mesh, tree, min_size=16)
    placed = jax.tree_util.tree_map(jax.device_put, tree, sh)
    spec = placed["w"].sharding.spec
    assert set(a for e in spec if e is not None
               for a in (e if isinstance(e, tuple) else (e,))) == \
        {"data", "model"}
    d = str(tmp_path / "ckpt2d")
    save_sharded_checkpoint(d, placed)
    _assert_tree_equal(tree, load_sharded_checkpoint(d))

    # exactly-once: the single (world=1-process) shard file holds all 8
    # pieces of the 4x2 grid and their sizes sum to the leaf exactly
    from flax import serialization
    [f] = glob.glob(os.path.join(d, "shard-*.msgpack"))
    content = serialization.msgpack_restore(open(f, "rb").read())
    pieces = list(content["w"].values())
    assert len(pieces) == 8
    assert sum(int(np.asarray(p["data"]).size) for p in pieces) == 64 * 32


def test_incomplete_directory_fails_loudly(tmp_path):
    mesh = make_mesh()
    placed = shard_tree_fsdp(mesh, {"w": np.ones((64, 16), np.float32)},
                             min_size=16)
    d = str(tmp_path / "ckpt")
    save_sharded_checkpoint(d, placed)
    [f] = glob.glob(os.path.join(d, "shard-*.msgpack"))
    # truncate one leaf's pieces: rewrite the shard file with half dropped
    from flax import serialization
    content = serialization.msgpack_restore(open(f, "rb").read())
    keys = sorted(content["w"])
    content["w"] = {k: content["w"][k] for k in keys[: len(keys) // 2]}
    with open(f, "wb") as fh:
        fh.write(serialization.msgpack_serialize(content))
    with pytest.raises(ValueError, match="incomplete"):
        load_sharded_checkpoint(d)
    os.unlink(f)
    with pytest.raises(FileNotFoundError):
        load_sharded_checkpoint(d)


def _cfg(extra):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"].update(extra)
    return cfg


def test_trainer_sharded_format_resume(tmp_path):
    run = str(tmp_path / "run")
    cfg = _cfg({"checkpoint_format": "sharded", "param_sharding": "fsdp",
                "fsdp_min_size": 256})
    tr = RegularDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=3)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert is_sharded_checkpoint(latest)
    assert len(glob.glob(os.path.join(latest, "shard-*.msgpack"))) == 1

    tr2 = RegularDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored leaves land fsdp-sharded again
    assert any(not l.sharding.is_fully_replicated
               for l in jax.tree_util.tree_leaves(tr2.state.params))


def test_trainer_sharded_format_replicated_mode(tmp_path):
    """The format is independent of the placement mode -- a plain-DP run
    can use it too (manifest + one shard file of full leaves)."""
    run = str(tmp_path / "run")
    cfg = _cfg({"checkpoint_format": "sharded"})
    tr = RegularDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=2)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert is_sharded_checkpoint(latest)
    tr2 = RegularDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 2


def test_format_switch_over_existing_file(tmp_path):
    """A run dir that already holds a full-file latest.ckpt can switch to
    the sharded format (the file is replaced by the directory)."""
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                 run_path=run)
    tr.train(max_steps=2)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert os.path.isfile(latest)
    cfg = _cfg({"checkpoint_format": "sharded"})
    tr2 = RegularDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 2
    tr2.train(max_steps=4)
    tr2._join_save()
    assert is_sharded_checkpoint(latest)
    tr3 = RegularDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr3.start_step == 4


def test_checkpoint_format_validation(tmp_path):
    cfg = _cfg({"checkpoint_format": "zarr"})
    with pytest.raises(ValueError, match="checkpoint_format"):
        RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "x"))


def test_ckpt_tool_cli_roundtrip(tmp_path, capsys):
    """scripts/ckpt_tool.py: info on both formats and a full -> sharded ->
    full conversion that round-trips byte-identically."""
    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys
    sys.path.insert(0, os.path.join(sys_path, "scripts"))
    import ckpt_tool

    tree = {"step": np.asarray(12, np.int32),
            "ema_denoise_fn": {"conv": {"kernel":
                               np.random.RandomState(0).randn(3, 3, 4, 8)
                               .astype(np.float32)}}}
    full = str(tmp_path / "a.ckpt")
    save_checkpoint(full, tree)

    ckpt_tool.main(["info", full])
    out = capsys.readouterr().out
    assert "format: full" in out and "step: 12" in out
    assert "ema_denoise_fn" in out and "288 params" in out

    sharded = str(tmp_path / "a.sharded")
    ckpt_tool.main(["to-sharded", full, sharded])
    assert is_sharded_checkpoint(sharded)
    ckpt_tool.main(["info", sharded])
    assert "format: sharded" in capsys.readouterr().out

    back = str(tmp_path / "b.ckpt")
    ckpt_tool.main(["to-full", sharded, back])
    _assert_tree_equal(load_checkpoint(full), load_checkpoint(back))

    with pytest.raises(SystemExit):
        ckpt_tool.main(["to-full", full, back])       # not a sharded dir
    with pytest.raises(SystemExit):
        ckpt_tool.main(["to-sharded", sharded, back])  # already a dir


def test_trainer_sharded_format_composed_mode(tmp_path):
    """The sharded format composes with the 2-D fsdp+tp placement: leaves
    sharded over both axes save piecewise and restore exactly."""
    run = str(tmp_path / "run")
    cfg = _cfg({"checkpoint_format": "sharded", "param_sharding": "fsdp+tp",
                "tp_size": 2, "fsdp_min_size": 256})
    tr = RegularDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=3)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert is_sharded_checkpoint(latest)
    tr2 = RegularDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_in_place_resave_is_crash_consistent(tmp_path):
    """Re-saving a directory writes step-tagged files and the manifest
    (written last) lists exactly the new set -- so a 'crash' between the
    new shard files landing and the new manifest landing leaves a
    directory that loads the OLD state, and after the manifest lands
    stale files are both ignored and cleaned up."""
    from pdae_tpu.utils.sharded_checkpoint import (cleanup_stale_shards,
                                                   extract_local_shards,
                                                   manifest_skeleton,
                                                   write_manifest,
                                                   write_shard_file)
    d = str(tmp_path / "ckpt")
    old = {"w": np.full((8, 8), 1.0, np.float32)}
    save_sharded_checkpoint(d, old, tag="100")
    np.testing.assert_array_equal(load_sharded_checkpoint(d)["w"], old["w"])

    # torn save: the step-200 shard file lands, manifest write never does
    new = {"w": np.full((8, 8), 2.0, np.float32)}
    write_shard_file(d, extract_local_shards(new), tag="200")
    assert len(glob.glob(os.path.join(d, "shard-*.msgpack"))) == 2
    np.testing.assert_array_equal(        # still the OLD complete save
        load_sharded_checkpoint(d)["w"], old["w"])

    # manifest lands -> new save visible; cleanup removes the stale file
    write_manifest(d, manifest_skeleton(new), tag="200")
    np.testing.assert_array_equal(load_sharded_checkpoint(d)["w"], new["w"])
    cleanup_stale_shards(d)
    files = glob.glob(os.path.join(d, "shard-*.msgpack"))
    assert [os.path.basename(f) for f in files] == \
        ["shard-200-00000-of-00001.msgpack"]
    np.testing.assert_array_equal(load_sharded_checkpoint(d)["w"], new["w"])


def test_manifest_missing_listed_file_fails(tmp_path):
    d = str(tmp_path / "ckpt")
    save_sharded_checkpoint(d, {"w": np.ones((4, 4), np.float32)})
    [f] = glob.glob(os.path.join(d, "shard-*.msgpack"))
    os.unlink(f)
    with pytest.raises(FileNotFoundError, match="missing on disk"):
        load_sharded_checkpoint(d)


def test_format_switch_back_to_full(tmp_path):
    """sharded -> full: the stale directory is replaced by the file and
    resume keeps working (previously the background writer died silently
    on os.replace-onto-a-directory and NO checkpoint was ever written)."""
    run = str(tmp_path / "run")
    cfg_sh = _cfg({"checkpoint_format": "sharded"})
    tr = RegularDiffusionTrainer(config=cfg_sh, run_path=run)
    tr.train(max_steps=2)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert os.path.isdir(latest)

    cfg_full = _cfg({})
    tr2 = RegularDiffusionTrainer(config=cfg_full, run_path=run,
                                  resume="latest")
    assert tr2.start_step == 2
    tr2.train(max_steps=4)
    tr2._join_save()
    assert os.path.isfile(latest)
    tr3 = RegularDiffusionTrainer(config=cfg_full, run_path=run,
                                  resume="latest")
    assert tr3.start_step == 4


def test_join_save_reraises_writer_failure(tmp_path):
    """A background checkpoint write that fails must surface at the next
    join, not vanish into the thread."""
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=copy.deepcopy(TINY_CONFIG),
                                 run_path=run)

    def boom():
        raise OSError("disk full")

    tr._spawn_save(boom)
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        tr._join_save()
    # the error is consumed; a later join is clean
    tr._join_save()


def test_full_save_over_torn_sharded_dir(tmp_path):
    """A sharded dir whose manifest never landed (crash in the FIRST
    sharded save) must not block full-format saves forever."""
    from pdae_tpu.utils.sharded_checkpoint import (extract_local_shards,
                                                   write_shard_file)
    run = str(tmp_path / "run")
    cfg = _cfg({})
    tr = RegularDiffusionTrainer(config=cfg, run_path=run)
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    os.makedirs(latest)
    write_shard_file(latest, extract_local_shards(
        {"w": np.ones((4, 4), np.float32)}), tag="9")
    assert not glob.glob(os.path.join(latest, "manifest*"))
    tr.train(max_steps=2)
    tr._join_save()
    assert os.path.isfile(latest)
    assert int(load_checkpoint(latest)["step"]) == 2


def test_full_save_refuses_foreign_directory(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=_cfg({}), run_path=run)
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    os.makedirs(latest)
    with open(os.path.join(latest, "user_data.txt"), "w") as f:
        f.write("not ours")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        tr.train(max_steps=2)
    assert os.path.exists(os.path.join(latest, "user_data.txt"))


def test_resume_heals_interrupted_format_swap(tmp_path):
    """Crash window between rmtree(dir) and os.replace(.swap -> latest):
    resume finds the .swap sibling and promotes it."""
    run = str(tmp_path / "run")
    cfg = _cfg({})
    tr = RegularDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=2)
    tr._join_save()
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    os.replace(latest, latest + ".swap")   # simulate the torn swap
    tr2 = RegularDiffusionTrainer(config=cfg, run_path=run,
                                  resume="latest")
    assert tr2.start_step == 2
    assert os.path.isfile(latest) and not os.path.exists(latest + ".swap")
