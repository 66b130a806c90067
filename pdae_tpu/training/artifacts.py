"""Cross-stage artifact loading: pre-trained DPMs, PDAE autoencoders,
inferred latent statistics.

The reference's 4-stage pipeline composes through checkpoint keys:
  stage 1 (DPM)            -> ``ema_denoise_fn``        (loaded strict=False
     into ShiftUNet, train_representation_learning.py:241-244)
  stage 2 (PDAE)           -> ``ema_encoder``/``ema_decoder``
     (train_latent_diffusion.py:42-56, train_manipulation.py)
  infer_latents            -> ``{mean, std}`` stats file
  stage 3/4 consume all of the above.

We keep the same keys; checkpoints are our msgpack format, and torch ``.pt``
files from the reference download links can be converted with
``scripts/convert_torch_checkpoint.py``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import load_checkpoint, load_yaml, merge_partial


def resolve_model_config(config_or_path) -> dict:
    """A trained-DPM config reference is either an inline dict (tests) or a
    path to the downloaded run config yaml (config/celeba64_*.yml:17)."""
    if isinstance(config_or_path, dict):
        cfg = config_or_path
    else:
        cfg = load_yaml(config_or_path)
    # the run config contains denoise_fn_config; a bare model config is
    # accepted as-is
    return cfg.get("denoise_fn_config", cfg)


def load_ddpm_params(ckpt_path: str, key: str = "ema_denoise_fn"):
    """Pre-trained DPM weights for the frozen trunk."""
    raw = load_checkpoint(ckpt_path)
    if key not in raw:
        raise KeyError(f"{ckpt_path} lacks '{key}' (keys: {list(raw)})")
    return raw[key]


def graft_ddpm_into_decoder(decoder_params: dict, ddpm_params: dict) -> dict:
    """strict=False load of the DPM into the ShiftUNet trunk: overwrite every
    matching subtree, keep the shift branch init
    (train_representation_learning.py:241-244)."""
    return merge_partial(decoder_params, ddpm_params)


def load_pdae(config_or_path, ckpt_path: str):
    """Load a trained PDAE stage: (run_config, ema_encoder, ema_decoder)."""
    cfg = config_or_path if isinstance(config_or_path, dict) else (
        load_yaml(config_or_path))
    raw = load_checkpoint(ckpt_path)
    return cfg, raw["ema_encoder"], raw["ema_decoder"]


def load_latent_stats(path: str) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """{mean, std} of the inferred z distribution (sampler/infer_latents.py
    output, consumed at train_latent_diffusion.py:58-61)."""
    raw = load_checkpoint(path)
    return (jnp.asarray(raw["mean"], jnp.float32),
            jnp.asarray(raw["std"], jnp.float32))
