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
DCN_AXIS = "dcn"     # slow inter-host axis (data-center network)
ICI_AXIS = "ici"     # fast intra-slice axis (inter-chip interconnect)
MODEL_AXIS = "model"  # tensor-parallel axis (channel-sharded params)
SPATIAL_AXIS = "sp"   # spatial-parallel axis (H-sharded activations)


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over every visible device."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_hier_mesh(shape: Optional[tuple] = None) -> Mesh:
    """2-D hierarchical mesh [DCN_AXIS, ICI_AXIS]: rows are hosts
    (slow DCN links between them), columns are each host's chips (fast
    ICI).  Shard batches over BOTH axes and params over ICI_AXIS only, and
    every GSPMD param all-gather / reduce-scatter rides ICI while only the
    (small) gradient all-reduce crosses DCN -- the standard TPU fleet
    layout (jax-ml.github.io/scaling-book).  The reference's NCCL DDP has
    no param-sharding mode at all, so nothing to mirror; this exists so
    our FSDP stays ICI-local on multi-host runs.

    ``shape=(rows, cols)`` overrides the host/chip layout (used by tests
    to model multiple "hosts" with one process's devices)."""
    if shape is None:
        by_proc = {}
        for d in jax.devices():
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [by_proc[p] for p in sorted(by_proc)]
        n_local = len(rows[0])
        if any(len(r) != n_local for r in rows):
            raise ValueError("uneven device count per process: "
                             f"{[len(r) for r in rows]}")
        grid = np.asarray(rows)
    else:
        grid = np.asarray(jax.devices()[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def make_tp_mesh(model_size: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D [DATA_AXIS, MODEL_AXIS] mesh for tensor parallelism: each row is
    one model-parallel group of ``model_size`` ICI-adjacent chips holding a
    channel-sharded copy of the model; rows are data-parallel replicas.
    Batches shard over DATA_AXIS only; params shard over MODEL_AXIS
    (``tp_sharding``).  The reference has no model sharding of any kind
    (SURVEY.md §2.3); TP exists here for the regimes DP can't help --
    per-chip memory beyond FSDP (opt-state AND activations split) and
    low-latency small-batch sampling where a batch of 1 can still use every
    chip."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_size < 1 or n % model_size:
        raise ValueError(f"model_size={model_size} must divide the device "
                         f"count {n}")
    grid = np.asarray(devices).reshape(n // model_size, model_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def make_sp_mesh(sp_size: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D [DATA_AXIS, SPATIAL_AXIS] mesh for spatial (context)
    parallelism: each row is one spatial-parallel group of ``sp_size``
    ICI-adjacent chips that share a batch shard, with activations sharded
    along image height (``constrain_spatial`` hints in the models); rows
    are data-parallel replicas.  Params stay replicated; GSPMD partitions
    every conv spatially with halo exchange (collective-permute of the
    kernel-overlap rows) and turns GN-stat reductions into psums -- the
    conv-net analog of sequence/context parallelism (GSPMD paper §3.3;
    scaling-book).  The reference has nothing like it (DP only,
    SURVEY.md §2.3); this is the axis that scales *resolution*: per-chip
    activation memory at 128px+ drops by ~sp_size where DP/FSDP can't
    help (activations dominate, not params), and batch-1 decode latency
    scales across chips for the conv-dominated trunk where TP's
    channel-sharding is collective-bound."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if sp_size < 1 or n % sp_size:
        raise ValueError(f"sp_size={sp_size} must divide the device "
                         f"count {n}")
    grid = np.asarray(devices).reshape(n // sp_size, sp_size)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def mesh_data_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dim shards over: every axis except the
    tensor- and spatial-parallel ones (hier meshes shard batches over both
    [dcn, ici]; tp/sp meshes over DATA_AXIS only, with batches replicated
    across each model-/spatial-parallel group)."""
    return tuple(a for a in mesh.axis_names
                 if a not in (MODEL_AXIS, SPATIAL_AXIS))


def data_sharding(mesh: Mesh, axis_name=None) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis (flat mesh) or
    over every mesh axis (hierarchical mesh)."""
    if axis_name is None:
        axis_name = mesh_data_axes(mesh)
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


def local_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over THIS PROCESS's devices.  In a single-process run this
    is every chip; in multi-process runs each process drives its own chips
    (host-local work like the sampler suite shards over this mesh, while
    training uses the global mesh)."""
    return Mesh(np.asarray(jax.local_devices()), (axis_name,))


def fsdp_sharding(mesh: Mesh, shape, axis_name: str = DATA_AXIS,
                  min_size: int = 2 ** 15) -> NamedSharding:
    """ZeRO-3-style sharding for one param leaf: shard the largest
    mesh-divisible dim over the data axis; small leaves stay replicated.

    With batches sharded over the same axis, GSPMD all-gathers each param
    for use and reduce-scatters its gradient -- FSDP semantics without any
    model changes (the reference has no sharded-parameter mode at all;
    its DDP keeps a full replica per rank, SURVEY.md §2.3).

    On a hierarchical mesh pass ``axis_name=ICI_AXIS``: params shard over
    the intra-host axis only (implicitly replicated over DCN_AXIS), so the
    per-use all-gathers never cross the slow inter-host links."""
    if int(np.prod(shape)) < min_size:
        return NamedSharding(mesh, P())
    world = mesh.shape[axis_name]
    dims = sorted(range(len(shape)), key=lambda i: shape[i], reverse=True)
    for i in dims:
        if shape[i] >= world and shape[i] % world == 0:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def fsdp_shardings(mesh: Mesh, tree, axis_name: str = DATA_AXIS,
                   min_size: int = 2 ** 15):
    """Per-leaf ``fsdp_sharding`` pytree for a param/opt-state tree."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_sharding(mesh, np.shape(x), axis_name, min_size),
        tree)


def shard_tree_fsdp(mesh: Mesh, tree, axis_name: str = DATA_AXIS,
                    min_size: int = 2 ** 15):
    """Lay a host/replicated pytree out FSDP-sharded over the mesh."""
    sh = fsdp_shardings(mesh, tree, axis_name, min_size)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)


def tp_sharding(mesh: Mesh, shape, min_size: int = 2 ** 15) -> NamedSharding:
    """Tensor-parallel sharding for one param leaf: channel-shard over
    MODEL_AXIS.  Flax layouts put output channels last (conv kernels HWIO,
    Dense in×out), so the last dim gets the axis (Megatron column-parallel);
    when it doesn't divide, the input-channel dim (-2) is tried
    (row-parallel -- GSPMD inserts the partial-sum reduce); vectors (biases,
    GN scales) and small leaves stay replicated.  Sharding propagation +
    GSPMD turn these annotations into the actual collective schedule; no
    model-code changes (same philosophy as ``fsdp_sharding``)."""
    world = mesh.shape[MODEL_AXIS]
    if int(np.prod(shape)) < min_size or len(shape) < 2 or world == 1:
        return NamedSharding(mesh, P())
    for i in (-1, -2):
        if shape[i] >= world and shape[i] % world == 0:
            spec = [None] * len(shape)
            spec[i] = MODEL_AXIS
            return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def tp_shardings(mesh: Mesh, tree, min_size: int = 2 ** 15):
    """Per-leaf ``tp_sharding`` pytree for a param/opt-state tree."""
    return jax.tree_util.tree_map(
        lambda x: tp_sharding(mesh, np.shape(x), min_size), tree)


def shard_tree_tp(mesh: Mesh, tree, min_size: int = 2 ** 15):
    """Lay a host/replicated pytree out tensor-parallel over the mesh."""
    return jax.tree_util.tree_map(
        jax.device_put, tree, tp_shardings(mesh, tree, min_size))


def fsdp_tp_sharding(mesh: Mesh, shape,
                     min_size: int = 2 ** 15) -> NamedSharding:
    """Composed 2-D param sharding for a [DATA_AXIS, MODEL_AXIS] mesh:
    the channel dim shards over MODEL_AXIS (the ``tp_sharding`` rule) AND
    the largest *remaining* mesh-divisible dim shards over DATA_AXIS (the
    ``fsdp_sharding`` rule) -- the standard FSDP-within-TP layout (each
    model-parallel group holds 1/tp of the channels, and that shard is
    further split 1/dp across the data replicas, all-gathered over
    DATA_AXIS per use).  Falls back gracefully: a leaf the TP rule can't
    split still gets FSDP-sharded, and vice versa; small leaves stay
    replicated.  Composes the two memory regimes -- TP's activation/math
    split with FSDP's param/opt-state split -- for models too big for
    either alone.  No reference counterpart (SURVEY.md §2.3: DP only)."""
    ndim = len(shape)
    if int(np.prod(shape)) < min_size:
        return NamedSharding(mesh, P())
    spec = [None] * ndim
    world_m = mesh.shape[MODEL_AXIS]
    tp_dim = None
    if ndim >= 2 and world_m > 1:
        for i in (ndim - 1, ndim - 2):
            if shape[i] >= world_m and shape[i] % world_m == 0:
                tp_dim = i
                spec[i] = MODEL_AXIS
                break
    world_d = mesh.shape[DATA_AXIS]
    if world_d > 1:
        dims = sorted((i for i in range(ndim) if i != tp_dim),
                      key=lambda i: shape[i], reverse=True)
        for i in dims:
            if shape[i] >= world_d and shape[i] % world_d == 0:
                spec[i] = DATA_AXIS
                break
    if all(s is None for s in spec):
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(*spec))


def fsdp_tp_shardings(mesh: Mesh, tree, min_size: int = 2 ** 15):
    """Per-leaf ``fsdp_tp_sharding`` pytree for a param/opt-state tree."""
    return jax.tree_util.tree_map(
        lambda x: fsdp_tp_sharding(mesh, np.shape(x), min_size), tree)


def ambient_mesh() -> Optional[Mesh]:
    """The Mesh made active by an enclosing ``with mesh:`` block (visible
    during jit TRACING too -- the context is a thread-local, not a traced
    op), or the ``jax.sharding.use_mesh`` abstract mesh; ``None`` when no
    mesh context is active.  Lets model code place sharding hints that are
    exact no-ops in mesh-free use (single-chip tests, reference-parity
    runs)."""
    try:  # the legacy pjit resource env (jax.interpreters.pxla re-export
        # is deprecated; the object itself lives in jax._src.mesh)
        from jax._src.mesh import thread_resources
        m = thread_resources.env.physical_mesh
        if not m.empty:
            return m
    except Exception:
        pass
    try:
        from jax.sharding import get_abstract_mesh
        m = get_abstract_mesh()
        if not m.empty:
            return m
    except Exception:
        pass
    return None


def constrain_batch(x):
    """``with_sharding_constraint(x, P(data_axes, None, ...))`` under the
    ambient mesh; identity without one.  Pins an activation to
    batch-sharded/feature-replicated at layout boundaries the partitioner
    can't shard through -- e.g. the encoder's conv->flatten->Dense
    transition, where a channel-sharded [B,H,W,C] flattening into
    [B,H*W*C] has no representable sharding and GSPMD falls back to
    involuntary full rematerialization in the backward (the flatten mixes
    the sharded minor dim into a merged dim).  Constraining both sides
    makes the flatten the (intended) channel all-gather point, in forward
    and in the transposed backward alike."""
    mesh = ambient_mesh()
    if mesh is None:
        return x
    axes = mesh_data_axes(mesh)
    if not axes:
        return x
    spec = P(axes if len(axes) > 1 else axes[0],
             *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def constrain_spatial(x):
    """Pin an NHWC activation to ``P(data_axes, SPATIAL_AXIS, None, None)``
    under an ambient mesh that has a spatial axis; identity otherwise.

    Placed at stage boundaries in the UNet/ShiftUNet/encoder so sharding
    propagation keeps every conv spatially partitioned end to end (probe
    evidence: GSPMD compiles the constrained fwd+bwd conv chain with halo
    collective-permutes only -- zero all-gathers).  The hints are exact
    no-ops in every other configuration: mesh-free single-chip use, DP /
    FSDP / hier meshes (no SPATIAL_AXIS), and TP meshes, whose
    channel-sharded activations must NOT be re-pinned here.  When H does
    not divide by the sp-axis size (odd feature maps), the leaf falls back
    to batch-only sharding rather than forcing an unsplittable layout."""
    mesh = ambient_mesh()
    if mesh is None or SPATIAL_AXIS not in mesh.axis_names:
        return x
    axes = mesh_data_axes(mesh)
    batch_spec = (axes if len(axes) > 1 else axes[0]) if axes else None
    sp = mesh.shape[SPATIAL_AXIS]
    if x.ndim == 4 and x.shape[1] % sp == 0:
        spec = P(batch_spec, SPATIAL_AXIS, None, None)
    else:
        spec = P(batch_spec, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)


def pad_shard_batch(mesh: Mesh, x, axis_name=None):
    """Lay a host batch out sharded over the mesh's data axis, wrap-padding
    the batch to a device-count multiple.

    Returns ``(sharded, original_n)`` -- slice results with
    ``[:original_n]``.  This is what makes the sampler suite multi-chip:
    the reference scales sampling only across processes (one GPU each,
    sampler/base_sampler.py); here one process saturates all local chips
    through GSPMD with the same jitted program."""
    import jax.numpy as jnp
    n = int(x.shape[0])
    # batch shards over the data axes only (== all devices except on a
    # tp mesh, where each model-parallel group sees the full row batch)
    world = int(np.prod([mesh.shape[a] for a in mesh_data_axes(mesh)]))
    pad = (-n) % world
    if pad:
        reps = -(-pad // n)  # wrap enough copies even when pad > n
        # host batches pad on the host (a jnp.concatenate would bounce
        # them through the default device before the sharded device_put);
        # device arrays stay on device
        cat = np.concatenate if isinstance(x, np.ndarray) else jnp.concatenate
        x = cat([x] + [x] * reps, axis=0)[:n + pad]
    return jax.device_put(x, data_sharding(mesh, axis_name)), n
