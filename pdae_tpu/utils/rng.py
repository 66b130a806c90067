"""Deterministic RNG discipline.

The reference seeds every rank identically before model build (identical
init), then re-seeds per rank for data/noise decorrelation
(``/root/reference/trainer/base_trainer.py:27-51``, base seed 666666666 in
``utils/utils.py:30-35``).  With jax.random the same discipline becomes
explicit key plumbing: one *init* key shared by all processes, one *train*
key folded with the process index and the step."""

from __future__ import annotations

import jax

BASE_SEED = 666666666


def init_key(seed: int = 0) -> jax.Array:
    """Identical across processes -> identical param init."""
    return jax.random.PRNGKey(BASE_SEED + seed)


def process_key(seed: int = 0, process_index=None) -> jax.Array:
    """Decorrelated across processes (reference set_seed(global_rank))."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(jax.random.PRNGKey(BASE_SEED + seed),
                              process_index + 1)


def step_key(key: jax.Array, step) -> jax.Array:
    """Per-step key: fold the step counter into a base key (jit-friendly)."""
    return jax.random.fold_in(key, step)
