"""Regular (unconditional/class-conditional) DDPM trainer.

Equivalent of ``/root/reference/trainer/train_regular_diffusion.py``:
epsilon-prediction MSE on random timesteps, Adam, EMA copy, periodic
DDIM-100 sample grids from the EMA weights.  The whole optimizer step --
micro-batch grad accumulation (``num_iterations``), gradient mean over the
data mesh axis (GSPMD inserts the psum), adam update and EMA lerp -- is ONE
jitted XLA program; the torch version's DDP hooks/GradScaler/host EMA loop
(train_regular_diffusion.py:28-178) all disappear into it.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import GaussianDiffusion
from ..models import build_denoise_fn
from ..utils import (init_key, process_key, restore_into, save_image_grid,
                     to_uint8, x0_from_transfer)
from ..utils.rng import step_key
from .base import BaseTrainer
from .state import (TrainState, accumulate_grads, make_optimizer,
                    maybe_ema_update)
from .steps import remat_wrap


class RegularDiffusionTrainer(BaseTrainer):

    def _build(self):
        self.gd = GaussianDiffusion(self.config["diffusion_config"])
        dn_cfg = self.config["denoise_fn_config"]
        self.model = build_denoise_fn(dn_cfg, dtype=self._compute_dtype())
        ds_cfg = self.config["train_dataset_config"]
        size = int(ds_cfg["image_size"])
        chans = int(ds_cfg["image_channel"])
        self.sample_shape = (size, size, chans)

        x = jnp.zeros((1, size, size, chans))
        t = jnp.zeros((1,), jnp.int32)
        cond = (jnp.zeros((1,), jnp.int32)
                if self.model.num_class is not None else None)
        variables = jax.jit(self.model.init)(init_key(self.seed), x, t, cond)
        params = variables["params"]

        self.tx = make_optimizer(self.config["optimizer_config"])
        self.state = TrainState.create(params, self.tx)
        self._base_rng = process_key(self.seed)

        ema_decay = float(self.runner_config.get("ema_decay", 0.9999))
        ema_every = int(self.runner_config.get("ema_every", 1))
        num_iters = self.num_iterations
        conditional = self.model.num_class is not None
        gd, model, tx = self.gd, self.model, self.tx

        def apply_fn(params, x, t, cond):
            return model.apply({"params": params}, x, t, cond)

        def train_apply(params, x, t, cond, drop_key):
            return model.apply({"params": params}, x, t, cond,
                               deterministic=False,
                               rngs={"dropout": drop_key})

        # checkpoint the TRAINING forward (the path with a backward
        # pass): extra fwd FLOPs for activation memory.  The eval
        # sampler has no backward, so checkpointing it would be a no-op.
        # ``remat: skips`` saves the UNet skip activations so the
        # backward recompute skips the trunk (steps.py::remat_wrap)
        train_apply = remat_wrap(train_apply,
                                 self.runner_config.get("remat"))

        @partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, batch):
            rng = step_key(self._base_rng, state.step)

            def loss_fn(params, x_0, cond, key):
                key, drop_key = jax.random.split(key)
                out = gd.regular_train_one_batch(
                    key,
                    lambda xx, tt, cc: train_apply(params, xx, tt, cc,
                                                   drop_key),
                    x_0, cond)
                return out["prediction_loss"]

            loss, grads = accumulate_grads(
                loss_fn, state.params, x0_from_transfer(batch["x_0"]), rng,
                num_iters,
                cond=batch.get("condition") if conditional else None)

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(jnp.add, state.params, updates)
            new_step = state.step + 1
            ema = maybe_ema_update(new_step, state.ema_params, params,
                                   ema_decay, ema_every)
            return state.replace(step=new_step, params=params,
                                 ema_params=ema, opt_state=opt_state), {
                "prediction_loss": loss}

        self._train_step = train_step

        @partial(jax.jit, static_argnums=(3,))
        def sample_fn(ema_params, x_T, cond, ddim_style):
            return gd.regular_ddim_sample(
                ddim_style,
                lambda xx, tt, cc: apply_fn(ema_params, xx, tt, cc), x_T,
                cond)

        self._sample_fn = sample_fn

    def train_step(self, state, batch):
        return self._train_step(state, batch)

    def _step_batch_keys(self):
        return (("x_0", "condition")
                if self.model.num_class is not None else ("x_0",))

    def evaluate(self, step: int, ddim_style: str = "ddim100"):
        n = int(self.dataloader_config.get("eval", {})
                .get("num_generations", 36))
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        # full x_T generated identically everywhere, each process decodes
        # its slice, primary gathers -- output is process-count-invariant
        x_T = jax.random.normal(key, (n,) + self.sample_shape)
        # class-conditional models sample the classes cyclically (the
        # reference's eval passes NO condition and would trip the UNet's
        # condition assert if mnist_regular's num_class were uncommented --
        # train_regular_diffusion.py:150-153 / model/unet.py:190-191)
        cond = (jnp.arange(n, dtype=jnp.int32) % self.model.num_class
                if self.model.num_class is not None else None)
        local, offset = self._eval_shard(n)
        ema = self._eval_local(self.state.ema_params)
        imgs = (np.asarray(self._sample_fn(
                    ema, x_T[offset:offset + local],
                    None if cond is None else cond[offset:offset + local],
                    ddim_style))
                if local else np.zeros((0,) + self.sample_shape, np.float32))
        all_imgs = self._gather_eval_images(imgs)
        if all_imgs is None:
            return
        grid = to_uint8(all_imgs)
        path = os.path.join(self.run_path, "samples", f"step-{step}.png")
        from ..utils.image import make_grid
        save_image_grid(grid, path)
        self.logger.image(step, "samples", make_grid(grid))

    # checkpoint keys mirror the reference (train_regular_diffusion.py:180-201)
    def state_dict(self):
        return {
            "denoise_fn": self.state.params,
            "ema_denoise_fn": self.state.ema_params,
            "optimizer": self.state.opt_state,
        }

    def load_state_dict(self, raw):
        params = restore_into(self.state.params, raw["denoise_fn"])
        ema = restore_into(self.state.ema_params, raw["ema_denoise_fn"])
        opt = restore_into(self.state.opt_state, raw["optimizer"])
        self.state = self.state.replace(
            step=jnp.asarray(int(raw["step"]), jnp.int32),
            params=params, ema_params=ema, opt_state=opt)
