"""LIVE 2-process distributed execution test.

Spawns two real ``jax.distributed`` CPU processes (localhost coordinator,
4 forced devices each = 8-device global mesh) and exercises, with
``process_count() == 2`` for real:

  * ``jax.distributed.initialize`` rendezvous (reference torchrun/NCCL
    init, utils/utils.py:18-27)
  * ``make_array_from_process_local_data`` batch assembly
    (data/pipeline.py prefetch path)
  * a jitted loss over the GLOBAL batch -- both processes see the same
    scalar, equal to the numpy loss over the concatenated per-process
    batches (cross-rank loss averaging is inherent in GSPMD)
  * ragged ``gather_objects`` (reference all_gather_object)
  * ``dispatch_num_samples_for_process`` sharded sampling
  * primary-gated eval gather (``BaseTrainer._gather_eval_images``)
  * ``sync_global_devices`` barrier
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("dist"))
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             coordinator, "2", str(i), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"
    res = {}
    for i in range(2):
        with open(os.path.join(outdir, f"rank{i}.json")) as f:
            res[i] = json.load(f)
    return res


def test_rendezvous_and_world(results):
    for r in (0, 1):
        assert results[r]["process_count"] == 2
        assert results[r]["local_device_count"] == 4
        assert results[r]["global_device_count"] == 8
    assert results[0]["is_primary"] is True
    assert results[1]["is_primary"] is False


def test_ragged_gather_objects(results):
    want = repr(["alpha", 1, {"k": [2, 3]}, {"beta": 1}])
    assert results[0]["gather_objects"] == want
    assert results[1]["gather_objects"] == want


def test_dispatch_shards_work(results):
    assert results[0]["dispatch_7"] == 4
    assert results[1]["dispatch_7"] == 3
    assert results[0]["eval_shard"] == [3, 0]
    assert results[1]["eval_shard"] == [2, 3]


def test_global_batch_and_loss(results):
    """The jitted loss is the cross-rank average by construction."""
    for r in (0, 1):
        assert results[r]["global_batch_shape"] == [16, 16]  # 2 x local 8
    l0, l1 = results[0]["global_loss"], results[1]["global_loss"]
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert l0 == pytest.approx(results[0]["numpy_global_loss"], rel=1e-5)
    assert results[0]["grad_norm"] == pytest.approx(
        results[1]["grad_norm"], rel=1e-6)


def test_primary_gated_eval_gather(results):
    assert results[1]["eval_gather"] is None          # non-primary: no write
    shape, rank_of_img = results[0]["eval_gather"]
    assert shape == [5, 2, 2, 3]
    # rank-ordered concatenation: first 3 images from rank 0, then 2 from 1
    assert rank_of_img == [0.0, 0.0, 0.0, 1.0, 1.0]


def test_eval_local_divergent_shapes(results):
    """Per-process eval compute on _eval_local param copies completes with
    DIFFERENT shapes per rank (would deadlock on global arrays)."""
    assert results[0]["eval_local_shape"] == [3, 1]
    assert results[1]["eval_local_shape"] == [2, 1]


def test_fsdp_across_processes(results):
    """Params sharded over the global mesh (each process holds only its
    shards), sharding kept across a donated jitted step, full host copies
    recovered on BOTH processes by the save/eval gather paths."""
    expected = float(np.sum(np.random.RandomState(3)
                            .randn(32, 16).astype(np.float32))) * 0.5
    for r in (0, 1):
        assert results[r]["fsdp_w_sharded"] is True
        assert results[r]["fsdp_w_still_sharded"] is True
        assert results[r]["fsdp_gather_shape"] == [32, 16]
        assert results[r]["fsdp_gather_sum"] == pytest.approx(expected,
                                                              rel=1e-5)
        assert results[r]["fsdp_eval_local_shape"] == [32, 16]
        assert results[r]["fsdp_dedup_equal"] is True
        assert results[r]["fsdp_dedup_meta"] == 7


def test_chunked_global_batches(results):
    """steps_per_dispatch chunks assemble into [K, B_local*world, ...]
    global arrays (dim 1 sharded) and per-step losses are the cross-rank
    values on every process."""
    want = [float(np.mean(np.concatenate(
               [np.random.RandomState(100 + r).randn(8, 16).astype(np.float32)
                + k for r in range(2)]) ** 2)) for k in (0.0, 1.0)]
    for r in (0, 1):
        assert results[r]["chunk_global_shape"] == [2, 16, 16]
        np.testing.assert_allclose(results[r]["chunk_losses"], want,
                                   rtol=1e-5)


def test_hier_mesh_fsdp_host_local(results):
    """Hierarchical [dcn, ici] mesh with 2 live processes: one row per
    process, batch sharded over both axes, params sharded over ici only --
    every process reconstructs each leaf from its OWN shards (param
    all-gathers never cross DCN), and the jitted loss is global."""
    want_loss = float(np.mean((np.concatenate(
        [np.random.RandomState(100 + r).randn(8, 16).astype(np.float32)
         for r in range(2)])
        @ np.random.RandomState(3).randn(32, 16).astype(np.float32).T) ** 2))
    for r in (0, 1):
        assert results[r]["hier_mesh_shape"] == [2, 4]
        assert results[r]["hier_data_axes"] == ["dcn", "ici"]
        assert results[r]["hier_global_batch_shape"] == [16, 16]
        assert results[r]["hier_w_sharded"] is True
        assert results[r]["hier_w_host_complete"] is True
        assert results[r]["hier_w_still_sharded"] is True
        assert results[r]["hier_loss"] == pytest.approx(want_loss, rel=1e-5)


def test_tp_across_live_processes(results):
    """Tensor parallelism with 2 live processes: data axis spans the
    processes, model axis is each process's local devices; params
    channel-shard over 'model' only and the jitted global loss matches the
    replicated math."""
    want_loss = float(np.mean((np.concatenate(
        [np.random.RandomState(100 + r).randn(8, 16).astype(np.float32)
         for r in range(2)])
        @ np.random.RandomState(3).randn(32, 16).astype(np.float32).T) ** 2))
    for r in (0, 1):
        assert results[r]["tp_mesh_shape"] == [2, 4]
        assert results[r]["tp_data_axes"] == ["data"]
        assert results[r]["tp_global_batch_shape"] == [16, 16]
        assert results[r]["tp_w_sharded"] is True
        assert results[r]["tp_w_spec_axes"] == ["model"]
        assert results[r]["tp_w_still_sharded"] is True
        assert results[r]["tp_loss"] == pytest.approx(want_loss, rel=1e-5)


def test_sharded_checkpoint_across_live_processes(results):
    """Per-process sharded checkpoint with 2 live processes: each rank
    writes only its replica-0 shards (no gather), both ranks reassemble
    the identical full tree, and the sum matches the host_copy_tree
    gather taken in the same run."""
    for r in (0, 1):
        assert results[r]["sharded_ckpt_is_valid"] is True
        assert results[r]["sharded_ckpt_shape"] == [32, 16]
        assert results[r]["sharded_ckpt_meta"] == 5
        # both per-process shard files exist (each rank wrote one;
        # default tag "0")
        assert results[r]["sharded_ckpt_files"] == [
            "shard-0-00000-of-00002.msgpack",
            "shard-0-00001-of-00002.msgpack"]
        assert results[r]["sharded_ckpt_sum"] == pytest.approx(
            results[r]["fsdp_gather_sum"], rel=1e-6)
    assert (results[0]["sharded_ckpt_sum"]
            == pytest.approx(results[1]["sharded_ckpt_sum"], rel=1e-6))


def test_fsdp_tp_across_live_processes(results):
    """Composed 2-D placement live: leaves shard over BOTH mesh axes
    across the two processes, the sharding survives a donated step, and
    the loss matches the replicated math."""
    want_loss = float(np.mean((np.concatenate(
        [np.random.RandomState(100 + r).randn(8, 16).astype(np.float32)
         for r in range(2)])
        @ np.random.RandomState(3).randn(32, 16).astype(np.float32).T) ** 2))
    for r in (0, 1):
        assert results[r]["fsdp_tp_w_spec_axes"] == ["data", "model"]
        assert results[r]["fsdp_tp_still_2d"] is True
        assert results[r]["fsdp_tp_loss"] == pytest.approx(want_loss,
                                                           rel=1e-5)


def test_device_resident_across_live_processes(results):
    """The multi-process branch of BaseTrainer._resident_device_data:
    identical per-process corpora become one replicated global array, and
    the in-jit index draw is process-invariant -- both ranks must compute
    the same resident batch."""
    r0, r1 = results[0], results[1]
    assert r0["resident_corpus_replicated"] and r1["resident_corpus_replicated"]
    assert r0["resident_batch_sum"] == r1["resident_batch_sum"]
