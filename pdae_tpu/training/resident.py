"""Device-resident training data: the whole corpus lives in HBM and each
train step gathers its minibatch ON DEVICE from indices drawn inside the
jitted program.

This removes the per-step host->device batch transfer entirely -- the wall
the real stage-3/4 loops hit on this host (PERF.md "The REAL stage-3
loop": 8.2 steps/s transfer-bound vs 233 steps/s device-resident; the
reference's counterpart is the host-driven DataLoader loop at
``/root/reference/trainer/train_latent_diffusion.py:95-130``, which pays
that transfer every step by construction).  The corpora this targets fit
HBM with room to spare: CelebA64 is 138k x 64x64x3 uint8 = 1.6 GB; the
stage-4 CelebA-HQ set is smaller still.

Sampling (``train_dataset_config.resident_sampling``):

* ``"epoch"`` (default): the index stream IS the host loader's stream --
  each epoch's rows are rebuilt from ``pipeline.Loader``'s own epoch
  permutation (same seed formula, same world-multiple padding, same
  per-rank slicing), so for non-augmented datasets resident training
  consumes bitwise the batches the host-loader path would, while the
  25 KB/dispatch index rows are the ONLY per-step host bytes.
* ``"uniform"``: indices drawn uniformly WITH REPLACEMENT inside the
  jitted program, keyed only by (seed, optimizer step) -- zero per-step
  host bytes at all, at the cost of a documented deviation from epoch
  shuffling (statistically interchangeable for SGD at these sizes).

Both modes are pure functions of the optimizer step, so
bitwise-deterministic resume holds for any ``steps_per_dispatch`` and
any checkpoint step, and K=1 vs K=k trajectories are IDENTICAL
(stronger than the host path, whose K-chunking only preserves the
stream, not the program).  Opt in per dataset with
``train_dataset_config.device_resident: true``.

Random horizontal flip (``augmentation: true`` datasets) moves on device
too: materialization fetches the un-flipped items (item rng ``None``) and
the step flips each gathered row by a per-(seed, step, row) coin --
flipping raw pixels commutes with the [-1,1] normalize, so numerics match
the host loader's PIL-side flip exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# fold_in tag separating the data-index stream from every model/noise
# stream (trainers key those off process_key/step_key)
DATA_STREAM_TAG = 0xD47A


def materialize_step_arrays(dataset, keys: Optional[tuple],
                            chunk: int = 1024) -> dict:
    """One pass over ``dataset`` in index order -> stacked numpy arrays of
    the step-consumed batch keys (collated exactly like the host loader,
    so dtypes -- including ``transfer_uint8`` -- match the transfer path).
    Item rng is None: augmentation is deferred to the device (see module
    docstring)."""
    collate = getattr(type(dataset), "collate_fn")
    n = len(dataset)
    if n == 0:
        raise ValueError("device_resident requires a non-empty dataset")
    parts = []
    for s in range(0, n, chunk):
        items = []
        for i in range(s, min(s + chunk, n)):
            try:
                items.append(dataset.__getitem__(i, None))
            except TypeError:          # datasets without an rng parameter
                items.append(dataset[i])
        b = collate(items)
        keep = tuple(keys) if keys is not None else tuple(b.keys())
        parts.append({k: np.asarray(b[k]) for k in keep if k in b})
    return {k: (np.concatenate([p[k] for p in parts])
                if len(parts) > 1 else parts[0][k])
            for k in parts[0]}


def epoch_global_indices(loader, epoch: int) -> np.ndarray:
    """One epoch's GLOBAL-batch index table, int32 [nb, world * B_local]:
    row b is the concatenation over ranks of the host loader's batch b
    (``pipeline.Loader._epoch_indices`` semantics by construction -- the
    per-rank tables come from Loader instances with the same seed, so the
    resident-epoch stream is bitwise the host-loader stream, including
    the world-multiple padding and per-rank striding)."""
    from ..data.pipeline import Loader
    world = loader.world
    per_rank = [Loader(loader.dataset, loader.batch_size,
                       shuffle=loader.shuffle, seed=loader.seed,
                       num_workers=1, process_index=r,
                       process_count=world)._epoch_indices(epoch)
                for r in range(world)]
    nb = loader.batches_per_epoch()
    b = loader.batch_size
    return np.stack([
        np.concatenate([pr[i * b:(i + 1) * b] for pr in per_rank])
        for i in range(nb)]).astype(np.int32)


class IdentityEncoder:
    """Stands in for the frozen semantic encoder when the trainer runs on
    PRECOMPUTED latents (``runner_config.latent_train_source:
    precomputed``): the gathered resident rows ARE the raw (un-normalized)
    z, so the stage-3/4 step keeps its exact structure
    (``gaussian.latent_diffusion_train_one_batch`` /
    ``manipulation_train_one_batch``) with the encoder forward removed."""

    @staticmethod
    def apply(_variables, z):
        return z


def encode_corpus(encoder, enc_params, x_host: np.ndarray,
                  chunk: int = 512):
    """Encode a materialized image corpus through the frozen encoder in
    fixed-size device chunks (ONE compiled shape; the ragged tail is
    padded with repeats then sliced).  Valid whenever the per-image z is
    deterministic (``augmentation: false`` -- the encoder is GroupNorm-
    normalized per sample, so z is also batch-composition-independent):
    encode-once-then-gather is mathematically the reference's
    encode-every-step (train_latent_diffusion.py:72-93) with the frozen
    forward hoisted out of the training loop.  Returns the raw z corpus
    as a device array [N, latent_dim]."""
    from ..utils.image import x0_from_transfer

    fn = jax.jit(lambda p, xb: encoder.apply({"params": p},
                                             x0_from_transfer(xb)))
    n = len(x_host)
    outs = []
    for s in range(0, n, chunk):
        xb = x_host[s:s + chunk]
        if len(xb) < chunk:
            pad = chunk - len(xb)
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, axis=0)])
            outs.append(fn(enc_params, xb)[:chunk - pad])
        else:
            outs.append(fn(enc_params, xb))
    return jnp.concatenate(outs, axis=0)


def sample_batch(data: dict, key, batch_size: int, n: int,
                 flip: bool = False, index_sharding=None,
                 indices=None) -> dict:
    """jit-traceable minibatch gather: take the rows at ``indices`` (epoch
    mode) or at ``batch_size`` uniform draws from ``key`` (uniform mode),
    optionally hflip ``x_0`` per-row.

    ``index_sharding`` (a NamedSharding over the mesh's data axes) pins the
    index vector so GSPMD partitions the gather: each chip reads only its
    batch shard's rows from the (replicated) corpus instead of gathering
    the global batch and slicing."""
    ikey, fkey = jax.random.split(key)
    if indices is None:
        idx = jax.random.randint(ikey, (batch_size,), 0, n)
    else:
        idx = indices
        batch_size = idx.shape[0]
    if index_sharding is not None:
        idx = jax.lax.with_sharding_constraint(idx, index_sharding)
    batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
    if flip and "x_0" in batch:
        x = batch["x_0"]
        assert x.ndim == 4, "device-side hflip expects NHWC x_0"
        coin = jax.random.bernoulli(fkey, 0.5, (batch_size,))
        batch["x_0"] = jnp.where(coin[:, None, None, None],
                                 x[:, :, ::-1, :], x)
    return batch
