"""PDAE representation-learning trainer: semantic encoder + ShiftUNet
gradient branch on a frozen pre-trained DPM.

Equivalent of ``/root/reference/trainer/train_representation_learning.py``.
TPU-first mechanics:

  * the frozen DPM trunk is NOT in the optimizer state at all -- the
    trainable pytree is {encoder, shift branch} and the trunk is passed as
    a separate (never-updated) jit argument, so ``requires_grad_(False)``
    + param groups (reference :58-70, shift_unet.py:299-310) become
    structural;
  * loss = SNR-weighted MSE(noise, eps + shift_coef * gradient)
    (gaussian_diffusion.py:246-251);
  * one jitted program per step: encoder fwd, ShiftUNet fwd, bwd, adam,
    EMA of the trainable subtree (reference EMA only touches
    requires_grad params, :192-212 -- same effect);
  * eval: shift-DDIM-100 grid of z-conditioned samples vs GTs (:158-190).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import GaussianDiffusion
from ..models import build_decoder, build_encoder
from ..utils import (init_key, process_key, restore_into, save_image_grid,
                     to_uint8, x0_from_transfer)
from ..utils.rng import step_key
from .artifacts import (graft_ddpm_into_decoder, load_ddpm_params,
                        resolve_model_config)
from .base import BaseTrainer
from .partition import merge_params, split_shift_unet
from .state import (TrainState, accumulate_grads, make_optimizer,
                    maybe_ema_update)
from .steps import remat_wrap


class RepresentationLearningTrainer(BaseTrainer):

    def _build(self):
        self.gd = GaussianDiffusion(self.config["diffusion_config"])
        ds_cfg = self.config["train_dataset_config"]
        size = int(ds_cfg["image_size"])
        chans = int(ds_cfg["image_channel"])
        self.sample_shape = (size, size, chans)

        ddpm_model_cfg = resolve_model_config(self.config["trained_ddpm_config"])
        dtype = self._compute_dtype()
        self.encoder = build_encoder(self.config["encoder_config"],
                                     image_size=size, dtype=dtype)
        self.decoder = build_decoder(self.config["decoder_config"],
                                     ddpm_model_cfg, dtype=dtype)

        x = jnp.zeros((1, size, size, chans))
        t = jnp.zeros((1,), jnp.int32)
        z = jnp.zeros((1, int(self.config["encoder_config"]["latent_dim"])))
        enc_params = jax.jit(self.encoder.init)(init_key(self.seed), x)["params"]
        dec_params = jax.jit(self.decoder.init)(
            init_key(self.seed + 1), x, t, z)["params"]

        # graft the pre-trained DPM into the frozen trunk (strict=False)
        ckpt = self.config.get("trained_ddpm_checkpoint")
        if ckpt:
            dec_params = graft_ddpm_into_decoder(
                dec_params, load_ddpm_params(ckpt))

        shift_params, frozen_params = split_shift_unet(dec_params)
        # pin the frozen trunk on device once (numpy leaves would be
        # re-uploaded on every step); never updated, bit-stable
        self.frozen_params = self._place_frozen(frozen_params)
        trainable = {"encoder": enc_params, "shift": shift_params}

        self.tx = make_optimizer(self.config["optimizer_config"])
        self.state = TrainState.create(trainable, self.tx)
        self._base_rng = process_key(self.seed)

        gd, encoder, decoder, tx = self.gd, self.encoder, self.decoder, self.tx
        ema_decay = float(self.runner_config.get("ema_decay", 0.9999))
        ema_every = int(self.runner_config.get("ema_every", 1))
        num_iters = self.num_iterations

        def enc_apply(p, x_0):
            return encoder.apply({"params": p}, x_0)

        # frozen params are an explicit argument: closed-over trees would be
        # baked into the HLO as constants (huge programs; axon remote compile
        # rejects them)
        def dec_apply(frozen, shift_p, x_t, t, z):
            full = merge_params(frozen, shift_p)
            return decoder.apply({"params": full}, x_t, t, z)

        def dec_train_apply(frozen, shift_p, xx, tt, zz, drop_key):
            # frozen trunk stays in eval mode; only the shift branch
            # trains with dropout (reference set_train_mode/freeze)
            full = merge_params(frozen, shift_p)
            return decoder.apply({"params": full}, xx, tt, zz,
                                 deterministic=True,
                                 shift_deterministic=False,
                                 rngs={"dropout": drop_key})

        # rematerialization: trade extra fwd FLOPs for activation memory
        # (128px models at large batch); runner_config.remat.  Applied to
        # the TRAINING forward (the one with a backward pass) -- the eval
        # sampler's dec_apply has no gradients to rematerialize.
        # ``remat: skips`` keeps the trunk skip activations saved so only
        # the shift branch is recomputed (steps.py::remat_wrap).
        dec_train_apply = remat_wrap(dec_train_apply,
                                     self.runner_config.get("remat"))

        @partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, frozen, batch):
            rng = step_key(self._base_rng, state.step)

            def loss_fn(params, x_0, _cond, key):
                key, drop_key = jax.random.split(key)
                out = gd.representation_learning_train_one_batch(
                    key, lambda xx: enc_apply(params["encoder"], xx),
                    lambda xx, tt, zz: dec_train_apply(
                        frozen, params["shift"], xx, tt, zz, drop_key),
                    x_0)
                return out["prediction_loss"]

            loss, grads = accumulate_grads(
                loss_fn, state.params, x0_from_transfer(batch["x_0"]), rng,
                num_iters)

            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(jnp.add, state.params, updates)
            new_step = state.step + 1
            ema = maybe_ema_update(new_step, state.ema_params, params,
                                   ema_decay, ema_every)
            return state.replace(step=new_step, params=params, ema_params=ema,
                                 opt_state=opt_state), {
                "prediction_loss": loss}

        self._train_step = train_step

        @partial(jax.jit, static_argnums=(3,))
        def sample_fn(ema_params, frozen, batch_x0_and_xT, ddim_style):
            x_0, x_T = batch_x0_and_xT
            return gd.representation_learning_ddim_sample(
                ddim_style,
                lambda xx: enc_apply(ema_params["encoder"], xx),
                lambda xx, tt, zz: dec_apply(frozen, ema_params["shift"],
                                             xx, tt, zz),
                x_0, x_T)

        self._sample_fn = sample_fn

    def train_step(self, state, batch):
        return self._train_step(state, self.frozen_params, batch)

    def _step_batch_keys(self):
        return ("x_0",)

    def _step_extra_args(self):
        return (self.frozen_params,)

    def evaluate(self, step: int, ddim_style: str = "ddim100"):
        n = int(self.dataloader_config.get("eval", {})
                .get("num_generations", 36))
        # same eval batch + x_T on every process; each decodes its slice,
        # primary gathers and writes (multi-host-safe, count-invariant)
        eval_batch = self._eval_batch(n)
        x_0 = jnp.asarray(x0_from_transfer(eval_batch["x_0"]))
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        x_T = jax.random.normal(key, x_0.shape)
        local, offset = self._eval_shard(x_0.shape[0])
        sl = slice(offset, offset + local)
        ema = self._eval_local(self.state.ema_params)
        frozen = self._eval_local(self.frozen_params)
        imgs = (np.asarray(self._sample_fn(ema, frozen,
                                           (x_0[sl], x_T[sl]), ddim_style))
                if local else np.zeros((0,) + x_0.shape[1:], np.float32))
        all_imgs = self._gather_eval_images(imgs)
        if all_imgs is None:
            return
        grid = to_uint8(all_imgs)
        path = os.path.join(self.run_path, "samples",
                            f"sample{step // 1000}k.png")
        save_image_grid(grid, path, gts=eval_batch["gts"][:all_imgs.shape[0]])
        from ..utils.image import make_grid
        self.logger.image(step, "result", make_grid(grid))

    def _eval_batch(self, n: int):
        items = [self.eval_dataset.__getitem__(i) for i in range(
            min(n, len(self.eval_dataset)))]
        return type(self.eval_dataset).collate_fn(items)

    # checkpoint keys mirror train_representation_learning.py:214-239
    def state_dict(self):
        dec = merge_params(self.frozen_params, self.state.params["shift"])
        ema_dec = merge_params(self.frozen_params,
                               self.state.ema_params["shift"])
        return {
            "encoder": self.state.params["encoder"],
            "ema_encoder": self.state.ema_params["encoder"],
            "decoder": dec,
            "ema_decoder": ema_dec,
            "optimizer": self.state.opt_state,
        }

    def load_state_dict(self, raw):
        enc = restore_into(self.state.params["encoder"], raw["encoder"])
        ema_enc = restore_into(self.state.ema_params["encoder"],
                               raw["ema_encoder"])
        full_template = merge_params(self.frozen_params,
                                     self.state.params["shift"])
        dec = restore_into(full_template, raw["decoder"])
        ema_dec = restore_into(full_template, raw["ema_decoder"])
        shift, frozen = split_shift_unet(dec)
        ema_shift, _ = split_shift_unet(ema_dec)
        self.frozen_params = self._place_frozen(frozen)
        opt = restore_into(self.state.opt_state, raw["optimizer"])
        self.state = self.state.replace(
            step=jnp.asarray(int(raw["step"]), jnp.int32),
            params={"encoder": enc, "shift": shift},
            ema_params={"encoder": ema_enc, "shift": ema_shift},
            opt_state=opt)
