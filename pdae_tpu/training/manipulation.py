"""Manipulation trainer: linear attribute classifier over normalized z.

Equivalent of ``/root/reference/trainer/train_manipulation.py``: a
``Linear(latent_dim, 40)`` trained with BCE-with-logits on the CelebA-HQ
attribute labels (loss at gaussian_diffusion.py:422-433), with the PDAE
encoder/decoder frozen.  Eval mirrors the reference's qualitative check
(:166-204): DDIM-500 encode, then manipulated DDIM-200 decode of attribute
31 ("Smiling") at scale 0.3.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import GaussianDiffusion
from ..models import (LinearClassifier, build_classifier, build_decoder,
                      build_encoder)
from ..utils import (init_key, process_key, restore_into, save_image_grid,
                     to_uint8, x0_from_transfer)
from ..utils.rng import step_key
from .artifacts import load_latent_stats, load_pdae, resolve_model_config
from .base import BaseTrainer
from .state import TrainState, make_optimizer
from .steps import make_manipulation_train_step


class ManipulationTrainer(BaseTrainer):

    def _build(self):
        pdae_cfg, enc_raw, dec_raw = load_pdae(
            self.config["trained_representation_learning_config"],
            self.config["trained_representation_learning_checkpoint"])
        diffusion_cfg = self.config.get("diffusion_config",
                                        pdae_cfg.get("diffusion_config"))
        self.gd = GaussianDiffusion(diffusion_cfg)

        ds_cfg = self.config["train_dataset_config"]
        size = int(ds_cfg["image_size"])
        chans = int(ds_cfg["image_channel"])

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
        self.latent_dim = int(pdae_cfg["encoder_config"]["latent_dim"])
        z = jnp.zeros((1, self.latent_dim))
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

        self.num_classes = int(self.config.get("num_classes", 40))
        self.model = build_classifier(self.num_classes)
        params = jax.jit(self.model.init)(
            init_key(self.seed + 3), z)["params"]

        self.tx = make_optimizer(self.config["optimizer_config"])
        self.state = TrainState.create(params, self.tx)
        self._base_rng = process_key(self.seed)

        gd, model, tx = self.gd, self.model, self.tx
        encoder, decoder = self.encoder, self.decoder
        mean, std = self.latents_mean, self.latents_std
        ema_decay = float(self.runner_config.get("ema_decay", 0.9999))
        ema_every = int(self.runner_config.get("ema_every", 1))

        # frozen encoder/decoder params are explicit jit args (constants
        # would bloat the HLO; see representation.py note)
        def enc_apply(ep, x_0):
            return encoder.apply({"params": ep}, x_0)

        def dec_apply(dp, x_t, tt, zc):
            return decoder.apply({"params": dp}, x_t, tt, zc)

        self._enc_apply = enc_apply
        self._dec_apply = dec_apply

        # latent_train_source 'precomputed': the stage-4 classifier
        # trains over the frozen encoder's z, which is deterministic per
        # image when augmentation is off -- encode the corpus once and
        # train the Linear head alone (same contract as the stage-3
        # option, training/latent.py)
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

        # the SHARED stage-4 step builder (training/steps.py) -- bench.py
        # measures the same program structure this trainer runs
        from .resident import IdentityEncoder
        step_encoder = (IdentityEncoder
                        if self.latent_source == "precomputed" else encoder)
        base_step = make_manipulation_train_step(
            gd, model, step_encoder, tx, mean, std, ema_decay=ema_decay,
            ema_every=ema_every)

        @partial(jax.jit, donate_argnums=0)
        def train_step(state: TrainState, enc_p, batch):
            state, loss = base_step(state, enc_p,
                                    x0_from_transfer(batch["x_0"]),
                                    batch["label"])
            return state, {"bce_loss": loss}

        self._train_step = train_step

        @partial(jax.jit, static_argnums=(5, 6, 7))
        def manip_fn(clf_params, enc_p, dec_p, x_0, inferred_x_T,
                     decode_style, class_id, scale):
            w = LinearClassifier.weight({"params": clf_params})
            return gd.manipulation_sample(
                decode_style, w, lambda xx: enc_apply(enc_p, xx),
                lambda xx, tt, zc: dec_apply(dec_p, xx, tt, zc),
                x_0, inferred_x_T, mean, std, class_id, scale)

        self._manip_fn = manip_fn

        @partial(jax.jit, static_argnums=(3,))
        def encode_fn(enc_p, dec_p, x_0, ddim_style):
            return gd.representation_learning_ddim_encode(
                ddim_style, lambda xx: enc_apply(enc_p, xx),
                lambda xx, tt, zc: dec_apply(dec_p, xx, tt, zc), x_0)

        self._encode_fn = encode_fn

    def train_step(self, state, batch):
        return self._train_step(state, *self._step_extra_args(), batch)

    def _step_extra_args(self):
        if self.latent_source == "precomputed":
            return ({},)
        return (self.encoder_params,)

    def _step_batch_keys(self):
        return ("x_0", "label")

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
            self._resident_cache = {
                "x_0": jax.device_put(z, self.replicated),
                "label": jax.device_put(jnp.asarray(host["label"]),
                                        self.replicated)}
        return self._resident_cache

    def evaluate(self, step: int, encode_style: str = "ddim500",
                 decode_style: str = "ddim200", class_id: int = 31,
                 scale: float = 0.3):
        # single-image eval: primary does the work, others skip (reference
        # manipulation eval runs on rank 0, train_manipulation.py:166-204).
        # Params are copied process-local first -- jitting over the GLOBAL
        # replicated arrays from one rank only would be a collective the
        # other processes never join (see BaseTrainer._eval_local).
        from ..parallel import is_primary
        # _eval_local is a collective in fsdp multi-process mode: every
        # process must reach it BEFORE the primary gate
        ema = self._eval_local(self.state.ema_params)
        enc = self._eval_local(self.encoder_params)
        dec = self._eval_local(self.decoder_params)
        if not is_primary():
            return
        items = [self.eval_dataset.__getitem__(i) for i in range(1)]
        batch = type(self.eval_dataset).collate_fn(items)
        x_0 = jnp.asarray(x0_from_transfer(batch["x_0"]))
        x_T = self._encode_fn(enc, dec, x_0, encode_style)
        imgs = np.asarray(self._manip_fn(ema, enc, dec, x_0, x_T,
                                         decode_style, class_id, scale))
        grid = np.concatenate([to_uint8(np.asarray(x_0)), to_uint8(imgs)])
        path = os.path.join(self.run_path, "samples",
                            f"sample{step // 1000}k.png")
        save_image_grid(grid, path, nrow=grid.shape[0])
        from ..utils.image import make_grid
        self.logger.image(step, "result", make_grid(grid, nrow=grid.shape[0]))

    def state_dict(self):
        return {
            "classifier": self.state.params,
            "ema_classifier": self.state.ema_params,
            "optimizer": self.state.opt_state,
        }

    def load_state_dict(self, raw):
        params = restore_into(self.state.params, raw["classifier"])
        ema = restore_into(self.state.ema_params, raw["ema_classifier"])
        opt = restore_into(self.state.opt_state, raw["optimizer"])
        self.state = self.state.replace(
            step=jnp.asarray(int(raw["step"]), jnp.int32),
            params=params, ema_params=ema, opt_state=opt)
