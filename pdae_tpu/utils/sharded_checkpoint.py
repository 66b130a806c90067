"""Per-process sharded checkpoints for FSDP/TP-scale state.

The single-file path (``checkpoint.py``) mirrors the reference's
rank-0 ``torch.save`` (``train_regular_diffusion.py:180-201``): the
primary writes the full tree, which in sharded-param multi-process runs
first requires ``parallel.host_copy_tree`` -- a full-model all-gather
plus a full host copy on every process, per save.  At FSDP scale that
gather IS the checkpoint bottleneck (it is why orbax/tensorstore exist).

This module writes the checkpoint the TPU-native way instead: EVERY
process writes only the shards it already holds, with no collective on
the data path at all; a small manifest records the global structure.

Layout (a directory, not a file)::

    ckpt.sharded/
      manifest.msgpack                # {shape,dtype} skeleton + the exact
                                      #   shard file list of THIS save
      shard-<tag>-00003-of-00008.msgpack  # process 3's slices, keyed by
                                      #   path; tag = step for trainers

De-duplication uses the device-level ``replica_id``: for every distinct
shard index of every leaf exactly one device in the whole system has
``replica_id == 0``, so each byte of the model is written exactly once
globally -- replicated leaves land in exactly one process's file,
FSDP/TP-split leaves land piecewise where they live.  Every file write
is atomic (tmp+rename), shard filenames carry a per-save tag, and the
manifest -- written LAST by the primary after a cross-process barrier --
lists that save's exact file set.  In-place re-saves (latest.ckpt) are
therefore crash-consistent: until the new manifest lands the directory
loads the previous complete save; afterwards stale files are ignored by
the loader and garbage-collected (``cleanup_stale_shards``).
``load_sharded_checkpoint`` reassembles the full numpy tree
from any filesystem view of the directory (the same shared-run-dir
assumption the reference's torchrun scripts make) and verifies slice
coverage, so truncated/partial directories fail loudly.
"""

from __future__ import annotations

import glob
import os
import tempfile
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

_SEP = "/"
_MANIFEST = "manifest.msgpack"


def _atomic_write(path: str, payload: bytes) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _flatten_dict(tree: Dict[str, Any], prefix: str = ""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, dict):
            if v:
                out.update(_flatten_dict(v, key))
            else:
                # preserve empty subtrees: optax states like EmptyState
                # become {} under to_state_dict, and from_state_dict
                # requires them present to rebuild the tuple structure
                out[key] = {}
        else:
            out[key] = v
    return out


def _unflatten_dict(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def _resolve_dtype(name: str):
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # registered extension dtypes (bfloat16, ...)
        return np.dtype(getattr(ml_dtypes, name))


def _local_pieces(leaf):
    """This process's uniquely-owned slices of one leaf.

    jax.Array: the addressable shards whose ``replica_id`` is 0 (each
    distinct slice of the global array has replica 0 on exactly one
    device system-wide).  Host leaves (numpy/scalars): process 0 owns
    the whole value.
    """
    if isinstance(leaf, jax.Array):
        pieces = []
        for sh in leaf.addressable_shards:
            if sh.replica_id != 0:
                continue
            starts = [0 if s.start is None else int(s.start)
                      for s in sh.index]
            pieces.append({"start": starts, "data": np.asarray(sh.data)})
        return pieces
    if jax.process_index() == 0:
        arr = np.asarray(leaf)
        return [{"start": [0] * arr.ndim, "data": arr}]
    return []


def shard_filename(process_index: int, process_count: int,
                   tag: str = "0") -> str:
    """``tag`` distinguishes saves that share a directory (trainers pass
    the step): re-saving latest.ckpt in place writes NEW filenames next
    to the old ones, the manifest (written last) lists exactly the new
    set, and only then are stale files deleted -- so a crash at any
    point leaves a directory whose manifest references one complete,
    self-consistent save (old or new), never a torn mix."""
    return f"shard-{tag}-{process_index:05d}-of-{process_count:05d}.msgpack"


def extract_local_shards(state: Dict[str, Any]) -> Dict[str, Any]:
    """Device->host copy of this process's uniquely-owned slices.

    Split from the file write so trainers can do the (cheap, 1/Nth-of-
    the-model) device pull on the main thread and hand serialization to
    a background writer, exactly like the single-file async path."""
    flat = _flatten_dict(serialization.to_state_dict(state))
    return {path: _local_pieces(leaf) for path, leaf in flat.items()
            if not isinstance(leaf, dict)}


def write_shard_file(dir_path: str, local_shards: Dict[str, Any],
                     tag: str = "0") -> str:
    """Atomically write this process's shard file; returns its path."""
    name = shard_filename(jax.process_index(), jax.process_count(), tag)
    path = os.path.join(dir_path, name)
    payload = serialization.msgpack_serialize(
        {p: {str(i): piece for i, piece in enumerate(pieces)}
         for p, pieces in local_shards.items() if pieces})
    _atomic_write(path, payload)
    return path


def manifest_skeleton(state: Dict[str, Any]) -> Dict[str, Any]:
    """Global tree skeleton: per-leaf {shape, dtype}.  Only metadata is
    touched, so this is safe on live (even donated) train state."""
    flat = _flatten_dict(serialization.to_state_dict(state))
    return {p: ({"empty": True} if isinstance(l, dict)
                else {"shape": [int(s) for s in np.shape(l)],
                      "dtype": str(l.dtype) if hasattr(l, "dtype")
                      else str(np.asarray(l).dtype)})
            for p, l in flat.items()}


def write_manifest(dir_path: str, skeleton: Dict[str, Any],
                   tag: str = "0") -> str:
    """Write the manifest from ``manifest_skeleton``'s output.

    Lists the exact shard filenames of THIS save (deterministic from
    world size + tag); the loader reads only those, so stale files from
    earlier saves or a different world size are ignored.  Call from the
    PRIMARY only, after every process's shard file is durable (barrier
    first in multi-process runs)."""
    world = jax.process_count()
    files = [shard_filename(i, world, tag) for i in range(world)]
    payload = serialization.msgpack_serialize(
        {"world": world, "files": {str(i): f for i, f in enumerate(files)},
         "leaves": skeleton})
    path = os.path.join(dir_path, _MANIFEST)
    _atomic_write(path, payload)
    return path


def cleanup_stale_shards(dir_path: str) -> None:
    """Delete shard files the manifest does not reference (leftovers from
    an earlier in-place save or a different world size).  Safe any time
    AFTER the manifest is durable; call from one process only."""
    with open(os.path.join(dir_path, _MANIFEST), "rb") as f:
        manifest = serialization.msgpack_restore(f.read())
    keep = set(manifest.get("files", {}).values())
    if not keep:      # legacy manifest without a file list: keep all
        return
    for fname in glob.glob(os.path.join(dir_path, "shard-*.msgpack")):
        if os.path.basename(fname) not in keep:
            try:
                os.unlink(fname)
            except FileNotFoundError:
                pass


def save_sharded_checkpoint(dir_path: str, state: Dict[str, Any],
                            barrier=None, tag: str = "0") -> None:
    """One-call save: every process writes its shard file; the primary
    writes the manifest after ``barrier()`` (pass
    ``parallel.sync_global_devices`` in multi-process runs) and then
    deletes shard files from earlier saves of the same directory."""
    os.makedirs(dir_path, exist_ok=True)
    write_shard_file(dir_path, extract_local_shards(state), tag)
    if barrier is not None:
        barrier("sharded_ckpt")
    if jax.process_index() == 0:
        write_manifest(dir_path, manifest_skeleton(state), tag)
        cleanup_stale_shards(dir_path)


def is_sharded_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, _MANIFEST))


def load_sharded_checkpoint(dir_path: str) -> Dict[str, Any]:
    """Assemble the full numpy tree from a checkpoint directory.

    Verifies every leaf is completely covered by the shard files, so a
    missing/truncated shard file fails with a clear error instead of
    returning silently-zero parameters."""
    with open(os.path.join(dir_path, _MANIFEST), "rb") as f:
        manifest = serialization.msgpack_restore(f.read())
    leaves = {}
    seen = {}
    for path, desc in manifest["leaves"].items():
        if desc.get("empty"):
            leaves[path] = {}   # preserved empty subtree (e.g. EmptyState)
            continue
        shape = tuple(int(s) for s in desc["shape"])
        leaves[path] = np.zeros(shape, _resolve_dtype(desc["dtype"]))
        seen[path] = set()
    listed = manifest.get("files", {})
    if listed:
        # the manifest names this save's exact file set; stale files from
        # earlier in-place saves / other world sizes are ignored
        shard_files = [os.path.join(dir_path, f)
                       for f in sorted(listed.values())]
        missing = [f for f in shard_files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"manifest lists shard files missing on disk: "
                f"{[os.path.basename(m) for m in missing]}")
    else:   # legacy directory without a file list
        shard_files = sorted(
            glob.glob(os.path.join(dir_path, "shard-*.msgpack")))
    if not shard_files:
        raise FileNotFoundError(f"no shard files in {dir_path}")
    for fname in shard_files:
        with open(fname, "rb") as f:
            content = serialization.msgpack_restore(f.read())
        for path, pieces in content.items():
            if path not in leaves:
                raise ValueError(f"{fname} has leaf {path!r} not in the "
                                 f"manifest")
            for piece in pieces.values():
                data = np.asarray(piece["data"])
                start = tuple(int(s) for s in piece["start"])
                idx = tuple(slice(st, st + sz)
                            for st, sz in zip(start, data.shape))
                leaves[path][idx] = data
                seen[path].add((start, data.shape))
    for path, covered in seen.items():
        total = sum(int(np.prod(shp)) for _, shp in covered)
        want = leaves[path].size
        if total != want:
            raise ValueError(
                f"leaf {path!r}: shard files cover {total} of {want} "
                f"elements -- incomplete checkpoint directory")
    # scalars saved from python/0-d numpy come back 0-d; keep as numpy
    return _unflatten_dict(leaves)
