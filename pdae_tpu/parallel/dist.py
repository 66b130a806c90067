"""Multi-host process utilities.

Replaces the reference's torchrun/NCCL process-group bootstrap and
object-gather helpers (``/root/reference/utils/utils.py:18-27``,
``trainer/base_trainer.py:143-159``) with jax.distributed + per-process
dataset slicing.  Collectives on arrays ride ICI via GSPMD; host-object
gathers use ``multihost_utils.process_allgather``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX if requested via args or env.

    Single-process (one host, N chips) needs no initialization -- GSPMD
    covers all local devices.  Multi-host runs set JAX_COORDINATOR_ADDRESS
    etc. (or pass args); this is the analogue of torchrun's rendezvous.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return
    # `is not None` (not `or`): process_id=0 is a valid explicit rank and
    # must not fall through to the env var
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=(num_processes if num_processes is not None
                       else int(os.environ["JAX_NUM_PROCESSES"])),
        process_id=(process_id if process_id is not None
                    else int(os.environ["JAX_PROCESS_ID"])))


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def dispatch_num_samples_for_process(total_num: int,
                                     rank: Optional[int] = None,
                                     world: Optional[int] = None) -> int:
    """How many samples this process generates out of ``total_num``.

    Same contract as the reference (trainer/base_trainer.py:143-153):
    floor-divide, remainder spread over the first ranks.
    """
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    base = total_num // world
    return base + (1 if rank < total_num % world else 0)


def process_shard_indices(n: int, rank: Optional[int] = None,
                          world: Optional[int] = None,
                          pad_to_even: bool = True) -> np.ndarray:
    """Per-process dataset index slice (DistributedSampler equivalent,
    trainer/base_trainer.py:73-79).  With ``pad_to_even`` the shard is
    padded by wrapping so every process sees the same count."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    idx = np.arange(n)
    if pad_to_even and n and n % world != 0:
        pad = world - (n % world)
        # wrap enough copies even when pad > n (e.g. 3 samples over 8
        # processes) -- torch DistributedSampler pads to
        # ceil(n/world)*world the same way; equal shard lengths are what
        # let per-batch collectives run in lockstep
        reps = -(-pad // n)
        idx = np.concatenate([idx] + [idx[:n]] * reps)[:n + pad]
    return idx[rank::world]


def gather_objects(local_list):
    """All-gather a list of host objects across processes
    (reference ``all_gather_object``, base_trainer.py:156-159).

    Works with ragged/unequal per-process contents: objects are pickled
    into a padded uint8 buffer (process_allgather needs equal shapes),
    then unpickled per process.
    """
    if jax.process_count() == 1:
        return list(local_list)
    import pickle
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(list(local_list)), np.uint8)
    n = np.asarray([payload.size])
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), np.uint8)
    padded[:payload.size] = payload
    all_payloads = multihost_utils.process_allgather(padded)
    out = []
    for i in range(all_payloads.shape[0]):
        out.extend(pickle.loads(all_payloads[i, :int(sizes[i])].tobytes()))
    return out


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-process barrier (reference ``dist.barrier()``)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def host_copy_tree(tree):
    """Full host (numpy) copy of a pytree whose leaves may be globally
    sharded jax.Arrays with non-addressable shards (FSDP mode in
    multi-process runs).  Collective: every process must call it.

    Fully-addressable leaves are plain device_get; the non-addressable
    rest are all-gathered in ONE ``process_allgather(tiled=True)`` call
    (this jax raises "only supports tiled=True" for global sharded
    arrays; tiled reassembles the original global shape).  Leaves that
    appear multiple times in the tree (e.g. a frozen trunk shared by the
    'decoder' and 'ema_decoder' checkpoint subtrees) are gathered once.
    """
    from jax.experimental import multihost_utils

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # dedupe by object identity, keyed by first-occurrence index so the
    # gathered pytree structure is identical on every process (id() is not)
    index_of = {}       # id(leaf) -> slot in uniq
    uniq = []
    for x in leaves:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if id(x) not in index_of:
                index_of[id(x)] = len(uniq)
                uniq.append(x)
    gathered = (multihost_utils.process_allgather(uniq, tiled=True)
                if uniq else [])

    def one(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable:
            return np.asarray(x)
        return gathered[index_of[id(x)]]

    return jax.tree_util.tree_unflatten(treedef, [one(x) for x in leaves])
