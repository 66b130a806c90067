"""Diffusion noise schedules and derived coefficient tables.

TPU-first design: every schedule is a small fp32 ``jnp`` array computed once
in float64 numpy (for accuracy) and closed over by jitted programs, where XLA
constant-folds the per-timestep gathers.  This replaces the torch buffer
soup of the reference (``/root/reference/diffusion/gaussian_diffusion.py:17-70``)
with a single immutable pytree.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def make_betas(betas_type: str, timesteps: int) -> np.ndarray:
    """Beta schedule. Mirrors reference ``gaussian_diffusion.py:16-29``."""
    if betas_type == "linear":
        return np.linspace(0.0001, 0.02, timesteps)
    if betas_type == "cosine":
        alpha_bar = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        max_beta = 0.999
        betas = []
        for i in range(timesteps):
            t1 = i / timesteps
            t2 = (i + 1) / timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
        return np.array(betas)
    if betas_type == "constant_0.008":
        # Latent DPM schedule (reference gaussian_diffusion.py:347).
        return np.full((timesteps,), 0.008)
    raise NotImplementedError(f"unknown betas_type: {betas_type}")


class Schedule(NamedTuple):
    """All derived coefficient tables, each of shape ``[timesteps]``, fp32.

    Field names mirror the reference buffers (gaussian_diffusion.py:39-70)
    so the math reads the same in both codebases.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod_m1: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    x_0_posterior_mean_x_0_coef: jnp.ndarray
    x_0_posterior_mean_x_t_coef: jnp.ndarray
    noise_posterior_mean_x_t_coef: jnp.ndarray
    noise_posterior_mean_noise_coef: jnp.ndarray
    shift_coef: jnp.ndarray
    weight: jnp.ndarray  # SNR^gamma / (1 + SNR), gamma = 0.1

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas_type: str = "linear", timesteps: int = 1000,
                  gamma: float = 0.1) -> Schedule:
    """Build every derived table from the beta schedule.

    Formulas match reference ``gaussian_diffusion.py:31-70`` exactly.
    """
    betas = make_betas(betas_type, timesteps).astype(np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:]))

    snr = alphas_cumprod / (1.0 - alphas_cumprod)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return Schedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recip_alphas_cumprod_m1=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        x_0_posterior_mean_x_0_coef=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        x_0_posterior_mean_x_t_coef=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        noise_posterior_mean_x_t_coef=f32(np.sqrt(1.0 / alphas)),
        noise_posterior_mean_noise_coef=f32(
            betas / (np.sqrt(alphas) * np.sqrt(1.0 - alphas_cumprod))),
        shift_coef=f32(
            -np.sqrt(alphas) * (1.0 - alphas_cumprod_prev) / np.sqrt(1.0 - alphas_cumprod)),
        weight=f32(snr ** gamma / (1.0 + snr)),
    )


def ddim_steps_from_style(ddim_style: str) -> int:
    """'ddim100' -> 100."""
    assert ddim_style.startswith("ddim"), ddim_style
    return int(ddim_style[len("ddim"):])


def respace(alphas_cumprod: np.ndarray, ddim_style: str):
    """DDIM re-spacing: sub-sequence betas + map back to original t axis.

    Set-of-linspace semantics with ``ddim_step + 1`` endpoints, matching
    reference ``gaussian_diffusion.py:76-94`` (incl. the dedup via ``set``).

    Returns ``(new_betas, timestep_map)`` as numpy arrays.
    """
    alphas_cumprod = np.asarray(alphas_cumprod, dtype=np.float64)
    original_timesteps = alphas_cumprod.shape[0]
    ddim_step = ddim_steps_from_style(ddim_style)
    use_timesteps = set(
        int(s) for s in np.linspace(0, original_timesteps - 1, ddim_step + 1))

    timestep_map = []
    new_betas = []
    last_alpha_cumprod = 1.0
    for i, ac in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1.0 - ac / last_alpha_cumprod)
            last_alpha_cumprod = ac
            timestep_map.append(i)
    return np.array(new_betas), np.array(timestep_map, dtype=np.int32)


class DDIMSchedule(NamedTuple):
    """Re-spaced schedule tables for the DDIM sub-sequence sampler.

    Arrays have length ``num_steps + 1`` (index 0 is the data point x_{-1});
    the loop runs over indices ``1..num_steps`` when sampling and
    ``0..num_steps-1`` when encoding, as in reference ``ddim.py:12-33``.
    """

    timestep_map: jnp.ndarray           # int32, [num_steps + 1]
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod_m1: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timestep_map.shape[0] - 1


def make_ddim_schedule(schedule_alphas_cumprod, ddim_style: str) -> DDIMSchedule:
    """Build the DDIM sub-sequence tables (reference ``ddim.py:8-33``)."""
    new_betas, timestep_map = respace(np.asarray(schedule_alphas_cumprod), ddim_style)
    alphas = 1.0 - new_betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DDIMSchedule(
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recip_alphas_cumprod_m1=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
    )


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample coefficients and broadcast over trailing dims.

    Equivalent of reference ``extract_coef_at_t`` (gaussian_diffusion.py:72-74)
    as a plain indexed gather.
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))
