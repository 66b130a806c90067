"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL/DDP machinery
(``/root/reference/utils/utils.py:18-27``, DDP wraps in ``trainer/*``):
a 1-D ``jax.sharding.Mesh`` over all chips carries data parallelism; the
mesh abstraction leaves room for extra axes (tp/pp) without API changes.
Gradient all-reduce is left to GSPMD: batches are sharded over the ``data``
axis, params replicated, and XLA inserts the ``psum`` over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over every visible device."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of arrays with the batch dim sharded over the
    mesh.  Equivalent of per-rank DistributedSampler slices landing on each
    GPU in the reference (trainer/base_trainer.py:73-79)."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
