"""Standalone PDAE train-step builder shared by the harness tools.

``bench.py`` (throughput measurement) and ``__graft_entry__.dryrun_multichip``
(sharding validation) both need the representation-learning optimizer step
as a self-contained function without a trainer's run-dir/loader machinery.
Keeping ONE builder here stops the two copies from drifting apart (they
had already diverged on the EMA decay) and keeps what the bench measures
structurally identical to what ``training/representation.py`` runs: loss
over the {encoder, shift} pytree with the frozen trunk merged per call,
value_and_grad, the configured optax update, and the EMA lerp — one jitted
program (reference equivalent: trainer/train_representation_learning.py
72-112's backward/step/accumulate sequence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .partition import merge_params
from .state import accumulate_grads, ema_update, maybe_ema_update


def remat_wrap(fn, mode):
    """Apply the configured rematerialization to a model-forward fn.

    ``mode`` is ``runner_config.remat``: falsy = no remat; ``"skips"`` =
    checkpoint with the ``save_only_these_names("unet_skip")`` policy, so
    the UNet/ShiftUNet skip activations (tagged in models/unet.py /
    shift_unet.py) stay saved and the backward recompute never re-runs
    the trunk -- for the PDAE step the recompute is then the shift branch
    only (the epsilon path is DCE'd: no gradient flows there); any other
    truthy value = full ``jax.checkpoint`` (recompute everything)."""
    if not mode:
        return fn
    if mode == "skips":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                "unet_skip"))
    return jax.checkpoint(fn)


def make_representation_train_step(gd, encoder, decoder, tx,
                                   ema_decay: float = 0.9999,
                                   remat=False, num_iters: int = 1):
    """Pure ``(state, frozen, x_0, rng) -> (state, loss)`` step.

    ``state.params`` must be ``{"encoder": ..., "shift": ...}``; ``frozen``
    is the ShiftUNet trunk (never updated, merged for each forward).
    ``remat`` checkpoints the decoder forward (the 128px training
    configuration, training/representation.py:104-109): ``True`` = full,
    ``"skips"`` = save the trunk skip activations (see :func:`remat_wrap`).
    ``num_iters`` > 1 splits the batch into that many micro-batches with
    grads accumulated in one ``lax.scan`` (the trainer's
    ``num_iterations``, state.py::accumulate_grads)."""

    dec_apply = remat_wrap(
        lambda frozen, shift, xx, tt, zz: decoder.apply(
            {"params": merge_params(frozen, shift)}, xx, tt, zz),
        remat)

    def train_step(state, frozen, x_0, rng):
        def loss_fn(params, xb, _cond, key):
            out = gd.representation_learning_train_one_batch(
                key,
                lambda xx: encoder.apply({"params": params["encoder"]}, xx),
                lambda xx, tt, zz: dec_apply(frozen, params["shift"],
                                             xx, tt, zz),
                xb)
            return out["prediction_loss"]

        loss, grads = accumulate_grads(
            loss_fn, state.params, x_0, rng, num_iters)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(jnp.add, state.params, updates)
        ema = ema_update(state.ema_params, params, ema_decay)
        return state.replace(step=state.step + 1, params=params,
                             ema_params=ema, opt_state=opt_state), loss

    return train_step


def make_latent_train_step(gd, model, encoder, tx, mean, std,
                           ema_decay: float = 0.9999, ema_every: int = 1,
                           num_iters: int = 1):
    """Pure ``(state, enc_p, x_0, rng) -> (state, loss)`` latent-DPM step.

    The stage-3 optimizer step (reference
    trainer/train_latent_diffusion.py:72-93): encode images with the
    frozen PDAE encoder, normalize with the inferred z stats, and train
    the MLPSkipNet with the latent-schedule loss.  ``LatentDiffusionTrainer``
    wraps this (adding its per-step rng derivation and metrics dict) and
    ``bench.py`` measures it -- one builder keeps the benched program
    structurally identical to the trained one (same rationale as
    :func:`make_representation_train_step`)."""

    def train_step(state, enc_p, x_0, rng):
        def loss_fn(params, xb, _cond, key):
            key, drop_key = jax.random.split(key)
            out = gd.latent_diffusion_train_one_batch(
                key,
                lambda zt, tt: model.apply(
                    {"params": params}, zt, tt, deterministic=False,
                    rngs={"dropout": drop_key}),
                lambda xx: encoder.apply({"params": enc_p}, xx),
                xb, mean, std)
            return out["prediction_loss"]

        loss, grads = accumulate_grads(
            loss_fn, state.params, x_0, rng, num_iters)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(jnp.add, state.params, updates)
        new_step = state.step + 1
        ema = maybe_ema_update(new_step, state.ema_params, params,
                               ema_decay, ema_every)
        return state.replace(step=new_step, params=params, ema_params=ema,
                             opt_state=opt_state), loss

    return train_step


def make_manipulation_train_step(gd, model, encoder, tx, mean, std,
                                 ema_decay: float = 0.9999,
                                 ema_every: int = 1):
    """Pure ``(state, enc_p, x_0, label) -> (state, loss)`` stage-4 step.

    Linear(latent_dim, 40) BCE-with-logits over the frozen encoder's
    normalized z (reference trainer/train_manipulation.py:31-38).  Shared
    by ``ManipulationTrainer`` and ``bench.py``."""

    def train_step(state, enc_p, x_0, label):
        def loss_fn(params):
            out = gd.manipulation_train_one_batch(
                lambda zn: model.apply({"params": params}, zn),
                lambda xx: encoder.apply({"params": enc_p}, xx),
                x_0, label, mean, std)
            return out["bce_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(jnp.add, state.params, updates)
        new_step = state.step + 1
        ema = maybe_ema_update(new_step, state.ema_params, params,
                               ema_decay, ema_every)
        return state.replace(step=new_step, params=params, ema_params=ema,
                             opt_state=opt_state), loss

    return train_step
