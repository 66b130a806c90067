"""Shared sampler machinery: model loading + pure apply functions.

Equivalent of ``/root/reference/sampler/base_sampler.py`` plus the
per-sampler ``_build_model`` boilerplate: load EMA weights from stage
checkpoints by logical key and expose PURE apply functions
``fn(params, ...)`` alongside the param trees.

IMPORTANT (TPU): params must be passed as jit ARGUMENTS, never closed over
-- closed-over arrays are baked into the HLO as constants, which bloats the
program (and the axon remote-compile endpoint rejects >~100MB bodies).
The ``encoder()``/``decoder()`` closure getters exist only for host-side
(non-jit) convenience.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import build_dataset
from ..diffusion import GaussianDiffusion
from ..models import (LinearClassifier, build_classifier, build_decoder,
                      build_denoise_fn, build_encoder)
from ..parallel import local_mesh, replicate
from ..training.artifacts import resolve_model_config
from ..utils import init_key, load_checkpoint, load_yaml, restore_into


def _replicate_local(tree):
    """Replicate params over THIS PROCESS's chips so sampler batches can be
    GSPMD-sharded across them (no-op placement on a single device)."""
    return replicate(local_mesh(), tree)


def _load_cfg(path_or_dict):
    if isinstance(path_or_dict, dict):
        return path_or_dict
    return load_yaml(path_or_dict)


class SamplerContext:
    """Builds (on demand) every model the sampler suite needs."""

    def __init__(self, config: dict):
        self.config = config
        diff_cfg = config.get("diffusion_config")
        self._pdae_cfg = None
        self._run_cfg = None
        if "config_path" in config:
            try:
                cfg = _load_cfg(config["config_path"])
                self._run_cfg = cfg
                if "encoder_config" in cfg:
                    self._pdae_cfg = cfg
            except Exception:
                self._pdae_cfg = None
        if diff_cfg is None and self._run_cfg is not None:
            # inherit the RUN's schedule whatever the config kind -- a
            # plain-DPM run config (test_dpms on a cosine model) must not
            # silently fall back to the linear default
            diff_cfg = self._run_cfg.get("diffusion_config")
        self.gd = GaussianDiffusion(diff_cfg or {"timesteps": 1000,
                                                 "betas_type": "linear"})
        self._built_pdae = False
        self._built_dn = False
        self._built_lat = False

    # -- dataset -------------------------------------------------------- #

    def dataset(self):
        cfg = dict(self.config["dataset_config"])
        cfg.setdefault("name", cfg.pop("dataset_name", None))
        return build_dataset(cfg)

    # -- pre-trained DPM (test_dpms) ------------------------------------ #

    def build_denoise(self):
        """Sets .denoise_apply(params, x, t, cond) and .dn_params."""
        if self._built_dn:
            return
        model_cfg = resolve_model_config(_load_cfg(self.config["config_path"]))
        model = build_denoise_fn(model_cfg)
        size = int(self.config.get("image_size",
                                   self.config.get("dataset_config", {})
                                   .get("image_size", 64)))
        chans = int(self.config.get("image_channel", 3))
        x = jnp.zeros((1, size, size, chans))
        t = jnp.zeros((1,), jnp.int32)
        template = jax.jit(model.init)(init_key(0), x, t)["params"]
        raw = load_checkpoint(self.config["checkpoint_path"])
        self.dn_params = _replicate_local(
            restore_into(template, raw["ema_denoise_fn"]))
        self.denoise_apply = (
            lambda p, xx, tt, cc=None: model.apply({"params": p}, xx, tt, cc))
        self._built_dn = True

    # -- PDAE encoder/decoder ------------------------------------------- #

    def build_pdae(self):
        """Sets .enc_apply/.dec_apply (params-first) and
        .enc_params/.dec_params."""
        if self._built_pdae:
            return
        pdae_cfg = self._pdae_cfg or _load_cfg(self.config["config_path"])
        ds_cfg = self.config.get("dataset_config", {})
        train_ds = pdae_cfg["train_dataset_config"]
        size = int(self.config.get(
            "image_size", ds_cfg.get("image_size", train_ds["image_size"])))
        chans = int(self.config.get(
            "image_channel",
            ds_cfg.get("image_channel", train_ds.get("image_channel", 3))))
        latent_dim = int(pdae_cfg["encoder_config"]["latent_dim"])
        self.latent_dim = latent_dim

        ddpm_cfg_path = self.config.get(
            "trained_ddpm_config_path", pdae_cfg.get("trained_ddpm_config"))
        ddpm_model_cfg = resolve_model_config(_load_cfg(ddpm_cfg_path))
        encoder = build_encoder(pdae_cfg["encoder_config"], image_size=size)
        decoder = build_decoder(pdae_cfg["decoder_config"], ddpm_model_cfg)

        x = jnp.zeros((1, size, size, chans))
        t = jnp.zeros((1,), jnp.int32)
        z = jnp.zeros((1, latent_dim))
        enc_t = jax.jit(encoder.init)(init_key(0), x)["params"]
        dec_t = jax.jit(decoder.init)(init_key(1), x, t, z)["params"]
        raw = load_checkpoint(self.config["checkpoint_path"])
        self.enc_params = _replicate_local(
            restore_into(enc_t, raw["ema_encoder"]))
        self.dec_params = _replicate_local(
            restore_into(dec_t, raw["ema_decoder"]))
        self.enc_apply = lambda p, xx: encoder.apply({"params": p}, xx)
        self.dec_apply = lambda p, xx, tt, zz: decoder.apply(
            {"params": p}, xx, tt, zz)
        self._built_pdae = True

    def encoder(self):
        """Host-side convenience closure (do NOT jit over it)."""
        self.build_pdae()
        return lambda xx: self.enc_apply(self.enc_params, xx)

    def decoder(self):
        self.build_pdae()
        return lambda xx, tt, zz: self.dec_apply(self.dec_params, xx, tt, zz)

    # -- latent DPM ------------------------------------------------------ #

    def build_latent(self):
        """Sets .latent_apply(params, z, t) / .lat_params /
        .latent_input_channel."""
        if self._built_lat:
            return
        from ..models import build_latent_denoise_fn
        lat_run_cfg = _load_cfg(self.config["latent_config_path"])
        lat_cfg = lat_run_cfg["latent_denoise_fn_config"]
        model = build_latent_denoise_fn(lat_cfg)
        zz = jnp.zeros((1, int(lat_cfg["input_channel"])))
        t = jnp.zeros((1,), jnp.int32)
        template = jax.jit(model.init)(init_key(2), zz, t)["params"]
        raw = load_checkpoint(self.config["latent_checkpoint_path"])
        self.lat_params = _replicate_local(
            restore_into(template, raw["ema_latent_denoise_fn"]))
        self.latent_apply = lambda p, z, tt: model.apply({"params": p}, z, tt)
        self.latent_input_channel = int(lat_cfg["input_channel"])
        self._built_lat = True

    # -- classifier ------------------------------------------------------ #

    def classifier_weight(self):
        raw = load_checkpoint(self.config["classifier_checkpoint_path"])
        num_classes = int(self.config.get("num_classes", 40))
        latent_dim = getattr(self, "latent_dim", 512)
        clf = build_classifier(num_classes)
        template = jax.jit(clf.init)(init_key(3),
                                     jnp.zeros((1, latent_dim)))["params"]
        params = restore_into(template, raw["ema_classifier"])
        return LinearClassifier.weight({"params": params})

    # -- latent stats ---------------------------------------------------- #

    def latent_stats(self):
        raw = load_checkpoint(self.config["inferred_latents_path"])
        return (jnp.asarray(raw["mean"], jnp.float32),
                jnp.asarray(raw["std"], jnp.float32))

    # -- misc ------------------------------------------------------------ #

    def output_path(self, default_name: str) -> str:
        out = self.config.get("output_path", f"./{default_name}")
        d = os.path.dirname(os.path.abspath(out))
        os.makedirs(d, exist_ok=True)
        return out
