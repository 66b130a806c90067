"""Latent DPM trainer: MLPSkipNet over the learned z-space.

Equivalent of ``/root/reference/trainer/train_latent_diffusion.py``:
loads the frozen EMA encoder+decoder from the PDAE checkpoint (:42-56) and
the z mean/std stats from ``infer_latents`` (:58-61); encodes on the fly,
normalizes, stops gradients, and trains the MLP with L1 loss on the
constant-beta latent schedule (gaussian_diffusion.py:344-398).  Eval runs
the full latent -> image unconditional pipeline (:180-209).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import GaussianDiffusion
from ..models import build_decoder, build_encoder, build_latent_denoise_fn
from ..utils import (init_key, process_key, restore_into, save_image_grid,
                     to_uint8, x0_from_transfer)
from ..utils.rng import step_key
from .artifacts import load_latent_stats, load_pdae, resolve_model_config
from .base import BaseTrainer
from .state import TrainState, make_optimizer
from .steps import make_latent_train_step


class LatentDiffusionTrainer(BaseTrainer):

    def _build(self):
        # diffusion config comes from the PDAE run (for the image decoder);
        # the latent process has its own fixed schedule
        pdae_cfg, enc_raw, dec_raw = load_pdae(
            self.config["trained_representation_learning_config"],
            self.config["trained_representation_learning_checkpoint"])
        diffusion_cfg = self.config.get("diffusion_config",
                                        pdae_cfg.get("diffusion_config"))
        self.gd = GaussianDiffusion(diffusion_cfg)

        ds_cfg = self.config["train_dataset_config"]
        size = int(ds_cfg["image_size"])
        chans = int(ds_cfg["image_channel"])
        self.sample_shape = (size, size, chans)

        ddpm_model_cfg = resolve_model_config(
            self.config.get("trained_ddpm_config",
                            pdae_cfg.get("trained_ddpm_config")))
        dtype = self._compute_dtype()
        self.encoder = build_encoder(pdae_cfg["encoder_config"],
                                     image_size=size, dtype=dtype)
        self.decoder = build_decoder(pdae_cfg["decoder_config"],
                                     ddpm_model_cfg, dtype=dtype)

        x = jnp.zeros((1, size, size, chans))
        t = jnp.zeros((1,), jnp.int32)
        latent_dim = int(pdae_cfg["encoder_config"]["latent_dim"])
        z = jnp.zeros((1, latent_dim))
        enc_template = jax.jit(self.encoder.init)(init_key(0), x)["params"]
        dec_template = jax.jit(self.decoder.init)(init_key(1), x, t, z)["params"]
        # pin frozen stage params on device once (numpy leaves would be
        # re-uploaded on every step)
        self.encoder_params = self._place_frozen(
            restore_into(enc_template, enc_raw))
        self.decoder_params = self._place_frozen(
            restore_into(dec_template, dec_raw))

        self.latents_mean, self.latents_std = load_latent_stats(
            self.config["inferred_latents"])

        lat_cfg = self.config["latent_denoise_fn_config"]
        self.latent_dim = int(lat_cfg["input_channel"])
        self.model = build_latent_denoise_fn(lat_cfg, dtype=dtype)
        zz = jnp.zeros((1, self.latent_dim))
        params = jax.jit(self.model.init)(
            init_key(self.seed + 2), zz, t)["params"]

        self.tx = make_optimizer(self.config["optimizer_config"])
        self.state = TrainState.create(params, self.tx)
        self._base_rng = process_key(self.seed)

        gd, model, tx = self.gd, self.model, self.tx
        encoder, decoder = self.encoder, self.decoder
        mean, std = self.latents_mean, self.latents_std
        ema_decay = float(self.runner_config.get("ema_decay", 0.9999))
        ema_every = int(self.runner_config.get("ema_every", 1))
        num_iters = self.num_iterations

        # frozen encoder/decoder params are explicit jit args (constants
        # would bloat the HLO; see representation.py note)
        def dec_apply(dp, x_t, tt, zc):
            return decoder.apply({"params": dp}, x_t, tt, zc)

        # latent_train_source 'precomputed': hoist the frozen encoder out
        # of the training loop -- the device-resident corpus holds the
        # raw z (encoded ONCE, training/resident.py::encode_corpus) and
        # the step trains the MLP alone.  Exactly the reference step with
        # the loop-invariant forward removed; requires deterministic z
        # (no augmentation) and a resident corpus.
        self.latent_source = str(self.runner_config.get(
            "latent_train_source", "encode"))
        if self.latent_source not in ("encode", "precomputed"):
            raise ValueError(
                f"runner_config.latent_train_source must be 'encode' or "
                f"'precomputed', got {self.latent_source!r}")
        if self.latent_source == "precomputed":
            if not self.device_resident:
                raise ValueError("latent_train_source 'precomputed' "
                                 "requires train_dataset_config."
                                 "device_resident: true")
            if getattr(self.train_dataset, "augmentation", False):
                raise ValueError(
                    "latent_train_source 'precomputed' requires "
                    "augmentation: false (a flipped image has a "
                    "different z; keep 'encode' for augmented corpora)")

        # the SHARED stage-3 step builder (training/steps.py) -- bench.py
        # measures the same program structure this trainer runs
        from .resident import IdentityEncoder
        step_encoder = (IdentityEncoder
                        if self.latent_source == "precomputed" else encoder)
        base_step = make_latent_train_step(
            gd, model, step_encoder, tx, mean, std, ema_decay=ema_decay,
            ema_every=ema_every, num_iters=num_iters)

        @partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, enc_p, batch):
            rng = step_key(self._base_rng, state.step)
            state, loss = base_step(state, enc_p,
                                    x0_from_transfer(batch["x_0"]), rng)
            return state, {"prediction_loss": loss}

        self._train_step = train_step

        @partial(jax.jit, static_argnums=(4, 5))
        def sample_fn(ema_params, dec_p, z_T, x_T, latent_ddim_style,
                      decoder_ddim_style):
            # z_T injected (not drawn inside) so eval work can be sharded
            # across processes with a process-count-invariant result
            return gd.latent_diffusion_sample(
                None, latent_ddim_style, decoder_ddim_style,
                lambda zt, tt: model.apply({"params": ema_params}, zt, tt),
                lambda xx, tt, zc: dec_apply(dec_p, xx, tt, zc),
                x_T, mean, std, latent_dim=self.latent_dim, z_T=z_T)

        self._sample_fn = sample_fn

    def train_step(self, state, batch):
        return self._train_step(state, *self._step_extra_args(), batch)

    def _step_extra_args(self):
        # precomputed mode: the step's encoder is the identity, so the
        # big frozen tree stays out of the dispatch path entirely
        if self.latent_source == "precomputed":
            return ({},)
        return (self.encoder_params,)

    def _step_batch_keys(self):
        return ("x_0",)

    def _resident_device_data(self):
        if self.latent_source != "precomputed":
            return super()._resident_device_data()
        if getattr(self, "_resident_cache", None) is None:
            from ..parallel import is_primary
            from .resident import encode_corpus, materialize_step_arrays
            host = materialize_step_arrays(self.train_dataset,
                                           self._step_batch_keys())
            z = encode_corpus(self.encoder, self.encoder_params,
                              host["x_0"])
            if is_primary():
                print(f"precomputed-z corpus: {z.shape[0]} items, "
                      f"{z.nbytes / 2 ** 20:.1f} MB/chip (replicated)",
                      flush=True)
            # the resident key stays 'x_0' so the shared step wrapper is
            # unchanged (x0_from_transfer is the identity on float z)
            self._resident_cache = {
                "x_0": jax.device_put(z, self.replicated)}
        return self._resident_cache

    def evaluate(self, step: int, latent_ddim_style: str = "ddim100",
                 decoder_ddim_style: str = "ddim100"):
        n = int(self.dataloader_config.get("eval", {})
                .get("num_generations", 36))
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        zkey, xkey = jax.random.split(key)
        x_T = jax.random.normal(xkey, (n,) + self.sample_shape)
        z_T = jax.random.normal(zkey, (n, self.latent_dim))
        local, offset = self._eval_shard(n)
        sl = slice(offset, offset + local)
        ema = self._eval_local(self.state.ema_params)
        dec = self._eval_local(self.decoder_params)
        imgs = (np.asarray(self._sample_fn(ema, dec, z_T[sl],
                                           x_T[sl], latent_ddim_style,
                                           decoder_ddim_style))
                if local else np.zeros((0,) + self.sample_shape, np.float32))
        all_imgs = self._gather_eval_images(imgs)
        if all_imgs is None:
            return
        grid = to_uint8(all_imgs)
        path = os.path.join(self.run_path, "samples",
                            f"sample{step // 1000}k.png")
        save_image_grid(grid, path)
        from ..utils.image import make_grid
        self.logger.image(step, "result", make_grid(grid))

    # keys mirror train_latent_diffusion.py save()
    def state_dict(self):
        return {
            "latent_denoise_fn": self.state.params,
            "ema_latent_denoise_fn": self.state.ema_params,
            "optimizer": self.state.opt_state,
        }

    def load_state_dict(self, raw):
        params = restore_into(self.state.params, raw["latent_denoise_fn"])
        ema = restore_into(self.state.ema_params, raw["ema_latent_denoise_fn"])
        opt = restore_into(self.state.opt_state, raw["optimizer"])
        self.state = self.state.replace(
            step=jnp.asarray(int(raw["step"]), jnp.int32),
            params=params, ema_params=ema, opt_state=opt)
