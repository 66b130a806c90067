"""Single-file msgpack checkpoints with the reference's logical keys.

The reference saves one ``torch.save`` dict per trainer from rank 0
(``/root/reference/trainer/train_regular_diffusion.py:180-201``) with keys
like ``step / denoise_fn / ema_denoise_fn / optimizer``; downstream stages
compose by loading sibling keys (``ema_encoder``/``ema_decoder``, see
train_latent_diffusion.py:42-56).  We keep those logical keys verbatim so
the 4-stage composition graph survives, stored as msgpack'd nested numpy
dicts (flax.serialization) written atomically.

Cadence helpers mirror ``latest.pt`` every N steps + immutable
``save-{N}k.pt`` snapshots (train_regular_diffusion.py:136-139).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    # to_state_dict turns tuples/NamedTuples (e.g. optax states) into nested
    # dicts that msgpack can serialize; leaves become numpy
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Atomically write a dict of pytrees (values may be scalars/arrays)."""
    from .sharded_checkpoint import _atomic_write   # shared tmp+rename
    payload = serialization.msgpack_serialize(_to_numpy_tree(state))
    _atomic_write(path, payload)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Restore the raw nested dict (numpy leaves).

    Dispatches on the on-disk form: a single msgpack file (the default,
    reference-shaped) or a per-process sharded directory
    (``checkpoint_format: sharded``, sharded_checkpoint.py) -- every
    consumer (resume, cross-run artifact refs, converters) accepts both
    transparently."""
    from .sharded_checkpoint import (is_sharded_checkpoint,
                                     load_sharded_checkpoint)
    if is_sharded_checkpoint(path):
        return load_sharded_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, raw):
    """Shape a raw restored dict onto a template pytree (e.g. params from
    ``model.init``), validating leaf shapes."""
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    shaped = serialization.from_state_dict(template, raw)
    flat_s, _ = jax.tree_util.tree_flatten(shaped)
    for a, b in zip(flat_t, flat_s):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint leaf shape mismatch: {np.shape(b)} vs template "
                f"{np.shape(a)}")
    return shaped


def merge_partial(template_params, partial_params, _path=""):
    """strict=False-style partial restore: overwrite the subtrees of
    ``template_params`` present in ``partial_params``; keys absent from the
    template are IGNORED (torch strict=False drops unexpected keys) and a
    dict-vs-leaf kind mismatch raises instead of silently unioning
    (reference ``load_state_dict(..., strict=False)``,
    train_representation_learning.py:241-244)."""
    if not isinstance(template_params, dict):
        if isinstance(partial_params, dict):
            raise ValueError(
                f"checkpoint subtree at '{_path}' is a dict but the model "
                f"expects a leaf (structural mismatch)")
        return partial_params
    if not isinstance(partial_params, dict):
        raise ValueError(
            f"checkpoint subtree at '{_path}' is a leaf but the model "
            f"expects a dict (structural mismatch)")
    out = dict(template_params)
    for k, v in partial_params.items():
        if k not in out:
            continue  # unexpected key: dropped, like torch strict=False
        out[k] = merge_partial(out[k], v, f"{_path}/{k}")
    return out


def checkpoint_paths(run_path: str):
    ckpt_dir = os.path.join(run_path, "checkpoints")
    return ckpt_dir, os.path.join(ckpt_dir, "latest.ckpt")


def snapshot_path(run_path: str, step: int) -> str:
    return os.path.join(run_path, "checkpoints", f"save-{step // 1000}k.ckpt")
