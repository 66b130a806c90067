"""Host-side input pipeline: shard -> shuffle -> decode (thread pool) ->
collate -> device prefetch.

Replaces torch DataLoader + DistributedSampler + the infinite cycling
iterator with broadcast epoch seeds (``/root/reference/trainer/
base_trainer.py:73-125``): each process deterministically derives the same
epoch permutation from (seed, epoch), takes its process slice, decodes
samples in a thread pool, and double-buffers batches onto the device so
the MXU never stalls on image loading.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class Loader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int = 4, process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 augment_seed: int = 1234):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, int(num_workers))
        self.rank = (jax.process_index() if process_index is None
                     else process_index)
        self.world = (jax.process_count() if process_count is None
                      else process_count)
        self.collate = getattr(type(dataset), "collate_fn")
        self._augment_seed = augment_seed

    def __len__(self):
        # must agree with the actual epoch stream: _epoch_indices pads the
        # dataset to a world multiple before slicing per rank
        return self.batches_per_epoch()

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # same permutation on every process (same seed+epoch), like the
            # reference's broadcast epoch seed (base_trainer.py:112-125)
            idx = np.random.RandomState(
                (self.seed * 1_000_003 + epoch) % (2 ** 31)).permutation(n)
        if n % self.world != 0:
            pad = self.world - (n % self.world)
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.rank::self.world]

    def batches_per_epoch(self) -> int:
        idx_len = len(self._epoch_indices(0))
        nb = (idx_len // self.batch_size if self.drop_last
              else -(-idx_len // self.batch_size))
        if nb == 0:
            # callers divide by this (resume fast-forward math); raise the
            # guidance here instead of a ZeroDivisionError there
            raise ValueError(
                f"per-process shard ({idx_len} samples) smaller than "
                f"batch_size ({self.batch_size}); reduce batch_size / "
                f"num_iterations or grow the dataset")
        return nb

    def epoch(self, epoch: int = 0, skip_batches: int = 0) -> Iterator[dict]:
        """One pass over this process's shard.

        ``skip_batches`` fast-forwards within the epoch WITHOUT decoding
        the skipped images (resume determinism: a resumed run consumes
        exactly the batches an uninterrupted run would)."""
        idx = self._epoch_indices(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else -(
            -len(idx) // self.batch_size)
        if nb == 0:
            raise ValueError(
                f"per-process shard ({len(idx)} samples) smaller than "
                f"batch_size ({self.batch_size}); reduce batch_size / "
                f"num_iterations or grow the dataset")
        def fetch(i):
            item_rng = np.random.default_rng(
                [self._augment_seed, self.rank, epoch, int(i)])
            return self._getitem(int(i), item_rng)

        # persistent pool (a with-block inside a generator leaks noisy
        # teardown errors when the generator is abandoned mid-epoch)
        if getattr(self, "_pool", None) is None:
            self._pool = cf.ThreadPoolExecutor(self.num_workers)
        for b in range(skip_batches, nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            items = list(self._pool.map(fetch, chunk))
            yield self.collate(items)

    def _getitem(self, i: int, rng):
        try:
            return self.dataset.__getitem__(i, rng)
        except TypeError:
            return self.dataset[i]

    def infinite(self, start_epoch: int = 0,
                 skip_batches: int = 0) -> Iterator[dict]:
        """Endless batches, new shuffle each epoch (base_trainer.py:112-125).
        ``skip_batches`` applies to the first epoch only (resume)."""
        epoch = start_epoch
        while True:
            yield from self.epoch(epoch, skip_batches)
            skip_batches = 0
            epoch += 1


def prefetch_to_device(iterator: Iterator[dict], size: int = 2,
                       sharding=None) -> Iterator[dict]:
    """Move batches to device ahead of consumption (double buffering).

    With a ``NamedSharding`` the batch lands sharded over the mesh's data
    axis.  Multi-host: each process's local batch becomes its addressable
    shard of a global array of shape [num_processes * local_batch, ...]
    (``make_array_from_process_local_data``), preserving the reference's
    per-process batch-size semantics (global batch = B x world).
    """
    queue = collections.deque()
    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is not None:
            if multihost:
                from jax import make_array_from_process_local_data
                return jax.tree_util.tree_map(
                    lambda x: make_array_from_process_local_data(
                        sharding, np.asarray(x)), batch)
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
