"""Train state and optimizer construction.

The functional analogue of the reference's trainer plumbing: params +
EMA params + optax state in one pytree, advanced by a single jitted step
(replacing the torch loop of forward/backward/scaler/EMA at
``/root/reference/trainer/train_regular_diffusion.py:72-178``).

bf16 note: on TPU we keep params/opt-state fp32 and run matmuls in bf16
via the models' ``dtype``; there is no GradScaler equivalent because bf16
needs no loss scaling (reference AMP machinery, train_*.py:40-41).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..utils.config import parse_adam_betas


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray          # int32 scalar
    params: Any                # trainable params
    ema_params: Any            # EMA of trainable params
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   ema_params=jax.tree_util.tree_map(jnp.copy, params),
                   opt_state=tx.init(params))


def make_optimizer(optimizer_config: dict) -> optax.GradientTransformation:
    """Adam/AdamW from the reference optimizer_config schema
    (lr / adam_betas / adam_eps / weight_decay / name)."""
    lr = float(optimizer_config["lr"])
    b1, b2 = parse_adam_betas(optimizer_config.get("adam_betas", (0.9, 0.999)))
    eps = float(optimizer_config.get("adam_eps", 1e-8))
    wd = float(optimizer_config.get("weight_decay", 0.0))
    name = optimizer_config.get("name", "Adam")
    if name not in ("Adam", "AdamW"):
        # never substitute silently: a typo'd name would train with the
        # wrong optimizer and misattribute the results
        raise ValueError(f"optimizer_config.name must be 'Adam' or "
                         f"'AdamW' (the two the reference uses, "
                         f"train_latent_diffusion.py:72-93), got {name!r}")
    if name == "AdamW":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    if wd > 0:
        # torch Adam's weight_decay is L2-into-gradient
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


def accumulate_grads(loss_fn, params, x_0, rng, num_iters: int, cond=None):
    """Mean (loss, grads) over ``num_iters`` micro-batches as ONE
    ``lax.scan`` inside the jitted step — the reference's
    ``num_iterations`` gradient accumulation
    (train_regular_diffusion.py:72-97) without per-micro-batch host
    dispatch.  ``loss_fn(params, x_b, cond_b, key)``; ``cond_b`` is None
    when ``cond`` is None (trainers without a conditioning input ignore
    it).  Shared by the regular/representation/latent trainers."""
    if num_iters <= 1:
        return jax.value_and_grad(loss_fn)(params, x_0, cond, rng)
    mb = x_0.shape[0] // num_iters
    x_mb = x_0.reshape((num_iters, mb) + x_0.shape[1:])
    cond_mb = (cond.reshape((num_iters, mb) + cond.shape[1:])
               if cond is not None else None)
    keys = jax.random.split(rng, num_iters)

    def micro(carry, inp):
        i, xb, key = inp
        cb = None if cond_mb is None else cond_mb[i]
        l, g = jax.value_and_grad(loss_fn)(params, xb, cb, key)
        la, ga = carry
        return (la + l, jax.tree_util.tree_map(jnp.add, ga, g)), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    (loss, grads), _ = jax.lax.scan(
        micro, (0.0, zero), (jnp.arange(num_iters), x_mb, keys))
    return loss / num_iters, jax.tree_util.tree_map(
        lambda g: g / num_iters, grads)


def ema_update(ema, params, decay: float):
    """ema <- ema * decay + params * (1 - decay)
    (reference ``accumulate``, train_regular_diffusion.py:170-178)."""
    d = jnp.asarray(decay, jnp.float32)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params)


def maybe_ema_update(step, ema, params, decay: float, every: int):
    """EMA applied every ``every`` steps (runner_config.ema_every)."""
    if every <= 1:
        return ema_update(ema, params, decay)
    return jax.lax.cond(step % every == 0,
                        lambda: ema_update(ema, params, decay),
                        lambda: ema)
