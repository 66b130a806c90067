"""Smoke tests for the multi-host data plumbing on a single process:
the pickle-padded object gather logic and process-local global arrays."""

import jax
import jax.numpy as jnp
import numpy as np

from pdae_tpu.parallel import (dispatch_num_samples_for_process,
                               gather_objects, process_shard_indices)


def test_gather_objects_single_process_passthrough():
    assert gather_objects([1, "a", np.zeros(3)])[1] == "a"


def test_gather_objects_pickle_roundtrip_logic():
    """Exercise the ragged-payload pad/unpickle logic that multi-host runs
    use, by simulating two processes' padded buffers."""
    import pickle
    lists = [[np.arange(5), "x"], [np.arange(3)]]  # ragged contents
    payloads = [np.frombuffer(pickle.dumps(l), np.uint8) for l in lists]
    sizes = np.array([p.size for p in payloads])
    m = sizes.max()
    stacked = np.stack([np.pad(p, (0, m - p.size)) for p in payloads])
    out = []
    for i in range(2):
        out.extend(pickle.loads(stacked[i, :sizes[i]].tobytes()))
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], np.arange(5))
    assert out[1] == "x"


def test_make_array_from_process_local_data_single_process():
    """Single-process path of the multihost batch construction: the local
    batch IS the global batch, sharded over the mesh."""
    from jax import make_array_from_process_local_data
    from pdae_tpu.parallel import data_sharding, make_mesh
    mesh = make_mesh()
    sh = data_sharding(mesh)
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_array_from_process_local_data(sh, local)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), local)


def test_dispatch_and_shard_consistency():
    total = 10
    counts = [dispatch_num_samples_for_process(total, r, 4) for r in range(4)]
    assert sum(counts) == total and max(counts) - min(counts) <= 1
    shards = [process_shard_indices(total, r, 4, pad_to_even=False)
              for r in range(4)]
    all_idx = np.concatenate(shards)
    assert sorted(all_idx.tolist()) == list(range(total))


def test_process_shard_indices_pad_exceeds_n():
    """pad_to_even must wrap ENOUGH copies when world > 2n (e.g. 3 samples
    over 8 processes): every rank gets exactly ceil(n/world) indices, like
    torch's DistributedSampler, so lockstep collectives can't starve."""
    from pdae_tpu.parallel import process_shard_indices

    for n, world in ((3, 8), (1, 8), (5, 8), (7, 3), (8, 8)):
        lens = [len(process_shard_indices(n, rank=r, world=world))
                for r in range(world)]
        assert len(set(lens)) == 1, (n, world, lens)
        assert lens[0] == -(-n // world), (n, world, lens)
        # every real index still covered
        covered = set()
        for r in range(world):
            covered |= set(process_shard_indices(n, rank=r, world=world)
                           .tolist())
        assert covered == set(range(n))
