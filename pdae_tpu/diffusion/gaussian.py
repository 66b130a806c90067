"""Gaussian diffusion process: q/posterior math, losses, training batches,
ancestral (DDPM) sampling, and workload-level entry points.

Functional, jit-friendly rework of the reference ``GaussianDiffusion``
(``/root/reference/diffusion/gaussian_diffusion.py``).  All randomness is
threaded through explicit ``jax.random`` keys; every sampling loop is a
``lax.scan`` so the whole trajectory compiles to one XLA program.

The model is always a plain callable:
  * ``denoise_fn(x_t, t, condition) -> eps`` (or 2x-channel with learned sigma)
  * ``decoder(x_t, t, z) -> (eps, gradient)`` (PDAE ShiftUNet)
  * ``latent_denoise_fn(z_t, t) -> eps``
  * ``encoder(x_0) -> z``
  * ``classifier(z_norm) -> logits``
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from . import ddim as ddim_lib
from . import dpm_solver as dpm_lib
from .schedules import (DDIMSchedule, Schedule, extract, make_ddim_schedule,
                        make_schedule)


class GaussianDiffusion:
    """Holds the schedule tables; every method is a pure function of its args.

    ``config`` mirrors the reference diffusion_config: ``{"timesteps": int,
    "betas_type": "linear"|"cosine"}``.
    """

    def __init__(self, config: dict):
        self.timesteps = int(config["timesteps"])
        self.betas_type = config["betas_type"]
        self.schedule = make_schedule(self.betas_type, self.timesteps)
        # Latent DPM runs its own constant-beta schedule with L1 loss
        # (reference gaussian_diffusion.py:344-363).
        self.latent_timesteps = 1000
        self.latent_schedule = make_schedule("constant_0.008", self.latent_timesteps)
        self.latent_loss_type = "l1"

    # ------------------------------------------------------------------ #
    # process math (reference gaussian_diffusion.py:98-175)
    # ------------------------------------------------------------------ #

    def q_sample(self, x_0, t, noise):
        s = self.schedule
        return (extract(s.sqrt_alphas_cumprod, t, x_0.ndim) * x_0
                + extract(s.sqrt_one_minus_alphas_cumprod, t, x_0.ndim) * noise)

    def q_posterior_mean(self, x_0, x_t, t):
        s = self.schedule
        return (extract(s.x_0_posterior_mean_x_0_coef, t, x_t.ndim) * x_0
                + extract(s.x_0_posterior_mean_x_t_coef, t, x_t.ndim) * x_t)

    def predicted_noise_to_predicted_x_0(self, x_t, t, predicted_noise):
        s = self.schedule
        return (extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
                - extract(s.sqrt_recip_alphas_cumprod_m1, t, x_t.ndim) * predicted_noise)

    def predicted_noise_to_predicted_mean(self, x_t, t, predicted_noise):
        s = self.schedule
        return (extract(s.noise_posterior_mean_x_t_coef, t, x_t.ndim) * x_t
                - extract(s.noise_posterior_mean_noise_coef, t, x_t.ndim) * predicted_noise)

    def learned_range_to_log_variance(self, learned_range, t):
        s = self.schedule
        nd = learned_range.ndim
        min_log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        max_log_variance = extract(jnp.log(s.betas), t, nd)
        frac = (learned_range + 1.0) / 2.0
        return min_log_variance + frac * (max_log_variance - min_log_variance)

    def noise_p_sample(self, rng, x_t, t, predicted_noise, learned_range=None,
                       *, noise=None):
        """One ancestral DDPM step from the predicted noise."""
        s = self.schedule
        nd = x_t.ndim
        predicted_mean = self.predicted_noise_to_predicted_mean(x_t, t, predicted_noise)
        if learned_range is not None:
            log_variance = self.learned_range_to_log_variance(learned_range, t)
        else:
            log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        if noise is None:
            noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero_mask = (1.0 - (t == 0).astype(x_t.dtype)).reshape(
            (x_t.shape[0],) + (1,) * (nd - 1))
        return predicted_mean + nonzero_mask * jnp.exp(0.5 * log_variance) * noise

    def x_0_clip_p_sample(self, rng, x_t, t, predicted_noise,
                          learned_range=None, clip_x_0=True, *, noise=None):
        s = self.schedule
        nd = x_t.ndim
        predicted_x_0 = self.predicted_noise_to_predicted_x_0(x_t, t, predicted_noise)
        if clip_x_0:
            predicted_x_0 = jnp.clip(predicted_x_0, -1.0, 1.0)
        predicted_mean = self.q_posterior_mean(predicted_x_0, x_t, t)
        if learned_range is not None:
            log_variance = self.learned_range_to_log_variance(learned_range, t)
        else:
            log_variance = extract(s.posterior_log_variance_clipped, t, nd)
        if noise is None:
            noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
        nonzero_mask = (1.0 - (t == 0).astype(x_t.dtype)).reshape(
            (x_t.shape[0],) + (1,) * (nd - 1))
        return predicted_mean + nonzero_mask * jnp.exp(0.5 * log_variance) * noise

    @staticmethod
    def p_loss(noise, predicted_noise, weight=None, loss_type="l2"):
        if loss_type == "l1":
            return jnp.mean(jnp.abs(noise - predicted_noise))
        if loss_type == "l2":
            if weight is not None:
                return jnp.mean(weight * (noise - predicted_noise) ** 2)
            return jnp.mean((noise - predicted_noise) ** 2)
        raise NotImplementedError(loss_type)

    # ------------------------------------------------------------------ #
    # ddim plumbing
    # ------------------------------------------------------------------ #

    def ddim_schedule(self, ddim_style: str) -> DDIMSchedule:
        return make_ddim_schedule(self.schedule.alphas_cumprod, ddim_style)

    def latent_ddim_schedule(self, ddim_style: str) -> DDIMSchedule:
        return make_ddim_schedule(self.latent_schedule.alphas_cumprod, ddim_style)

    # Both decode ("sample") AND encode (inversion) styles accept an
    # extended vocabulary beyond the reference: "ddim<N>" runs the
    # reference-parity DDIM loop, "dpm<N>" runs DPM-Solver++(2M) over a
    # lambda-uniform grid (dpm_solver.py) -- ~5x fewer NFE for
    # DDIM-100-class trajectories; the encode direction reuses the same
    # exact-in-x0 update on the reversed grid (fast DDIM inversion).

    @staticmethod
    def _is_solver_style(style: str) -> bool:
        return style.startswith("dpm")

    def solver_tables(self, style: str, spacing: str = "lambda",
                      direction: str = "decode") -> dpm_lib.SolverTables:
        return dpm_lib.make_solver_tables(self.schedule.alphas_cumprod, style,
                                          spacing=spacing,
                                          direction=direction)

    def latent_solver_tables(self, style: str,
                             spacing: str = "lambda") -> dpm_lib.SolverTables:
        return dpm_lib.make_solver_tables(self.latent_schedule.alphas_cumprod,
                                          style, spacing=spacing)

    def ddim_sample(self, ddim_style, denoise_fn, x_T, condition=None):
        if self._is_solver_style(ddim_style):
            return dpm_lib.dpm_solver_sample_loop(
                self.solver_tables(ddim_style), denoise_fn, x_T, condition)
        return ddim_lib.ddim_sample_loop(
            self.ddim_schedule(ddim_style), denoise_fn, x_T, condition)

    def ddim_encode(self, ddim_style, denoise_fn, x_0, condition=None):
        if self._is_solver_style(ddim_style):
            return dpm_lib.dpm_solver_encode_loop(
                self.solver_tables(ddim_style, direction="encode"),
                denoise_fn, x_0, condition)
        return ddim_lib.ddim_encode_loop(
            self.ddim_schedule(ddim_style), denoise_fn, x_0, condition)

    def test_pretrained_dpms(self, ddim_style, denoise_fn, x_T, condition=None):
        return self.ddim_sample(ddim_style, denoise_fn, x_T, condition)

    # ------------------------------------------------------------------ #
    # regular diffusion (gaussian_diffusion.py:199-229)
    # ------------------------------------------------------------------ #

    def regular_train_one_batch(self, rng, denoise_fn, x_0, condition=None,
                                *, t=None, noise=None):
        """``t``/``noise`` may be injected for deterministic parity tests;
        by default they are drawn from ``rng`` (reference draws them from
        torch global RNG, gaussian_diffusion.py:202-203)."""
        if t is None or noise is None:
            t_rng, noise_rng = jax.random.split(rng)
        batch = x_0.shape[0]
        if t is None:
            t = jax.random.randint(t_rng, (batch,), 0, self.timesteps, jnp.int32)
        if noise is None:
            noise = jax.random.normal(noise_rng, x_0.shape, x_0.dtype)
        x_t = self.q_sample(x_0, t, noise)
        predicted_noise = denoise_fn(x_t, t, condition)
        return {"prediction_loss": self.p_loss(noise, predicted_noise)}

    def regular_ddim_sample(self, ddim_style, denoise_fn, x_T, condition=None):
        return self.ddim_sample(ddim_style, denoise_fn, x_T, condition)

    def regular_ddpm_sample(self, rng, denoise_fn, x_T, condition=None,
                            *, noise=None):
        """Full-T ancestral sampling as one lax.scan program.

        ``noise`` ([timesteps, *x_T.shape], ordered t = T-1 .. 0) may be
        injected for deterministic parity tests."""
        batch, ch = x_T.shape[0], x_T.shape[-1]

        def body(x, step):
            i, key, injected = step
            t = jnp.full((batch,), i, jnp.int32)
            output = denoise_fn(x, t, condition)
            if output.shape[-1] == 2 * ch:
                predicted_noise, learned_range = jnp.split(output, 2, axis=-1)
            else:
                predicted_noise, learned_range = output, None
            return self.noise_p_sample(key, x, t, predicted_noise,
                                       learned_range, noise=injected), None

        if rng is None:
            # rng may only be omitted when the noise is injected -- a silent
            # fixed-key fallback would make every call's draws identical
            assert noise is not None, "rng is required when noise is None"
            rng = jax.random.PRNGKey(0)   # keys traced but unused
        steps = jnp.arange(self.timesteps - 1, -1, -1)
        keys = jax.random.split(rng, self.timesteps)
        x, _ = jax.lax.scan(body, x_T, (steps, keys, noise))
        return x

    # ------------------------------------------------------------------ #
    # representation learning / PDAE (gaussian_diffusion.py:234-339)
    # ------------------------------------------------------------------ #

    def representation_learning_train_one_batch(self, rng, encoder, decoder,
                                                x_0, *, t=None, noise=None):
        if t is None or noise is None:
            t_rng, noise_rng = jax.random.split(rng)
        batch = x_0.shape[0]
        z = encoder(x_0)
        if t is None:
            t = jax.random.randint(t_rng, (batch,), 0, self.timesteps, jnp.int32)
        if noise is None:
            noise = jax.random.normal(noise_rng, x_0.shape, x_0.dtype)
        x_t = self.q_sample(x_0, t, noise)
        predicted_noise, gradient = decoder(x_t, t, z)
        shift_coef = extract(self.schedule.shift_coef, t, x_0.ndim)
        weight = extract(self.schedule.weight, t, x_0.ndim)
        loss = self.p_loss(noise, predicted_noise + shift_coef * gradient,
                           weight=weight)
        return {"prediction_loss": loss}

    def representation_learning_ddpm_sample(self, rng, encoder, decoder, x_0,
                                            x_T, z=None, *, noise=None):
        if z is None:
            z = encoder(x_0)
        batch = x_T.shape[0]

        def body(x, step):
            i, key, injected = step
            t = jnp.full((batch,), i, jnp.int32)
            predicted_noise, gradient = decoder(x, t, z)
            shift_coef = extract(self.schedule.shift_coef, t, x.ndim)
            return self.noise_p_sample(
                key, x, t, predicted_noise + shift_coef * gradient,
                noise=injected), None

        if rng is None:
            # rng may only be omitted when the noise is injected -- a silent
            # fixed-key fallback would make every call's draws identical
            assert noise is not None, "rng is required when noise is None"
            rng = jax.random.PRNGKey(0)   # keys traced but unused
        steps = jnp.arange(self.timesteps - 1, -1, -1)
        keys = jax.random.split(rng, self.timesteps)
        x, _ = jax.lax.scan(body, x_T, (steps, keys, noise))
        return x

    def representation_learning_ddim_sample(self, ddim_style, encoder, decoder,
                                            x_0, x_T, z=None, stop_percent=0.0):
        if z is None:
            z = encoder(x_0)
        if self._is_solver_style(ddim_style):
            return dpm_lib.shift_dpm_solver_sample_loop(
                self.solver_tables(ddim_style), decoder, z, x_T,
                stop_percent=stop_percent)
        return ddim_lib.shift_ddim_sample_loop(
            self.ddim_schedule(ddim_style), decoder, z, x_T,
            stop_percent=stop_percent)

    def representation_learning_ddim_encode(self, ddim_style, encoder, decoder,
                                            x_0, z=None):
        if z is None:
            z = encoder(x_0)
        if self._is_solver_style(ddim_style):
            return dpm_lib.shift_dpm_solver_encode_loop(
                self.solver_tables(ddim_style, direction="encode"),
                decoder, z, x_0)
        return ddim_lib.shift_ddim_encode_loop(
            self.ddim_schedule(ddim_style), decoder, z, x_0)

    def representation_learning_autoencoding(self, encoder_ddim_style,
                                             decoder_ddim_style, encoder,
                                             decoder, x_0):
        z = encoder(x_0)
        inferred_x_T = self.representation_learning_ddim_encode(
            encoder_ddim_style, encoder, decoder, x_0, z)
        return self.representation_learning_ddim_sample(
            decoder_ddim_style, None, decoder, None, inferred_x_T, z)

    def representation_learning_gap_measure(self, rng, encoder, decoder, x_0,
                                            *, noise=None):
        """Posterior-mean-gap curves across every t, as one scan.

        NOTE: the reference uses *uniform* noise here (``torch.rand_like``,
        gaussian_diffusion.py:302) -- a quirk we reproduce faithfully.
        Returns two arrays of shape [timesteps], ordered t = T-1 .. 0 like
        the reference's python list.  ``noise`` ([timesteps, *x_0.shape],
        ordered t = T-1 .. 0) may be injected for parity tests.
        """
        batch = x_0.shape[0]
        z = encoder(x_0)

        def body(carry, step):
            i, key, injected = step
            t = jnp.full((batch,), i, jnp.int32)
            eps = (jax.random.uniform(key, x_0.shape, x_0.dtype)
                   if injected is None else injected)
            x_t = self.q_sample(x_0, t, eps)
            predicted_noise, gradient = decoder(x_t, t, z)

            predicted_x_0 = self.predicted_noise_to_predicted_x_0(x_t, t, predicted_noise)
            predicted_posterior_mean = self.q_posterior_mean(predicted_x_0, x_t, t)

            shift_coef = extract(self.schedule.shift_coef, t, x_0.ndim)
            ae_noise = predicted_noise + shift_coef * gradient
            ae_x_0 = self.predicted_noise_to_predicted_x_0(x_t, t, ae_noise)
            ae_posterior_mean = self.q_posterior_mean(ae_x_0, x_t, t)

            true_posterior_mean = self.q_posterior_mean(x_0, x_t, t)
            gap = jnp.mean((true_posterior_mean - predicted_posterior_mean) ** 2)
            ae_gap = jnp.mean((true_posterior_mean - ae_posterior_mean) ** 2)
            return carry, (gap, ae_gap)

        if rng is None:
            # rng may only be omitted when the noise is injected -- a silent
            # fixed-key fallback would make every call's draws identical
            assert noise is not None, "rng is required when noise is None"
            rng = jax.random.PRNGKey(0)   # keys traced but unused
        steps = jnp.arange(self.timesteps - 1, -1, -1)
        keys = jax.random.split(rng, self.timesteps)
        _, (gaps, ae_gaps) = jax.lax.scan(body, None, (steps, keys, noise))
        return gaps, ae_gaps

    def representation_learning_denoise_one_step(self, rng, encoder, decoder,
                                                 x_0, timestep_list: Sequence[int],
                                                 *, noise=None):
        t = jnp.asarray(timestep_list, jnp.int32)
        if noise is None:
            noise = jax.random.normal(rng, x_0.shape, x_0.dtype)
        x_t = self.q_sample(x_0, t, noise)
        z = encoder(x_0)
        predicted_noise, gradient = decoder(x_t, t, z)
        predicted_x_0 = self.predicted_noise_to_predicted_x_0(x_t, t, predicted_noise)
        shift_coef = extract(self.schedule.shift_coef, t, x_0.ndim)
        ae_noise = predicted_noise + shift_coef * gradient
        ae_x_0 = self.predicted_noise_to_predicted_x_0(x_t, t, ae_noise)
        return predicted_x_0, ae_x_0

    def representation_learning_ddim_trajectory_interpolation(
            self, ddim_style, decoder, z_1, z_2, x_T, alpha):
        return ddim_lib.shift_ddim_trajectory_interpolation(
            self.ddim_schedule(ddim_style), decoder, z_1, z_2, x_T, alpha)

    # ------------------------------------------------------------------ #
    # latent DPM (gaussian_diffusion.py:344-415)
    # ------------------------------------------------------------------ #

    @staticmethod
    def normalize(z, mean, std):
        return (z - mean) / std

    @staticmethod
    def denormalize(z, mean, std):
        return z * std + mean

    def latent_diffusion_train_one_batch(self, rng, latent_denoise_fn, encoder,
                                         x_0, latents_mean, latents_std,
                                         *, t=None, noise=None):
        ls = self.latent_schedule
        z_0 = jax.lax.stop_gradient(encoder(x_0))
        z_0 = self.normalize(z_0, latents_mean, latents_std)
        batch = z_0.shape[0]
        if t is None or noise is None:
            t_rng, noise_rng = jax.random.split(rng)
        if t is None:
            t = jax.random.randint(t_rng, (batch,), 0, self.latent_timesteps, jnp.int32)
        if noise is None:
            noise = jax.random.normal(noise_rng, z_0.shape, z_0.dtype)
        z_t = (extract(ls.sqrt_alphas_cumprod, t, z_0.ndim) * z_0
               + extract(ls.sqrt_one_minus_alphas_cumprod, t, z_0.ndim) * noise)
        predicted_noise = latent_denoise_fn(z_t, t)
        loss = self.p_loss(noise, predicted_noise, loss_type=self.latent_loss_type)
        return {"prediction_loss": loss}

    def latent_diffusion_sample(self, rng, latent_ddim_style, decoder_ddim_style,
                                latent_denoise_fn, decoder, x_T, latents_mean,
                                latents_std, latent_dim: int = 512, *, z_T=None):
        """z_T ~ N(0,1) clamped -> latent DDIM -> denormalize -> shift decode
        with stop_percent=0.3 (reference gaussian_diffusion.py:400-415)."""
        batch = x_T.shape[0]
        if z_T is None:
            z_T = jax.random.normal(rng, (batch, latent_dim), x_T.dtype)
        z_T = jnp.clip(z_T, -1.0, 1.0)  # clamp follows the reference's sampling path
        if self._is_solver_style(latent_ddim_style):
            z = dpm_lib.latent_dpm_solver_sample_loop(
                self.latent_solver_tables(latent_ddim_style),
                latent_denoise_fn, z_T)
        else:
            dds = self.latent_ddim_schedule(latent_ddim_style)
            z = ddim_lib.latent_ddim_sample_loop(dds, latent_denoise_fn, z_T)
        z = self.denormalize(z, latents_mean, latents_std)
        return self.representation_learning_ddim_sample(
            decoder_ddim_style, None, decoder, None, x_T, z, stop_percent=0.3)

    # ------------------------------------------------------------------ #
    # manipulation (gaussian_diffusion.py:422-443)
    # ------------------------------------------------------------------ #

    def manipulation_train_one_batch(self, classifier, encoder, x_0, label,
                                     latents_mean, latents_std):
        z = jax.lax.stop_gradient(encoder(x_0))
        z_norm = self.normalize(z, latents_mean, latents_std)
        prediction = classifier(z_norm)
        gt = (label > 0).astype(prediction.dtype)
        # binary cross entropy with logits, mean reduction
        loss = jnp.mean(
            jnp.maximum(prediction, 0) - prediction * gt
            + jnp.log1p(jnp.exp(-jnp.abs(prediction))))
        return {"bce_loss": loss}

    def manipulation_sample(self, ddim_style, classifier_weight, encoder,
                            decoder, x_0, inferred_x_T, latents_mean,
                            latents_std, class_id: int, scale: float):
        z = encoder(x_0)
        z_norm = self.normalize(z, latents_mean, latents_std)
        w = classifier_weight[class_id][None, :]
        # F.normalize semantics: eps floor keeps an all-zero row a zero
        # edit direction instead of NaN (reference gaussian_diffusion.py:439)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        # the reference hardcodes sqrt(512) regardless of the latent dim
        # (gaussian_diffusion.py:440) -- reproduce the quirk verbatim
        z_norm_manipulated = z_norm + scale * math.sqrt(512) * w
        z_manipulated = self.denormalize(z_norm_manipulated, latents_mean, latents_std)
        return self.representation_learning_ddim_sample(
            ddim_style, None, decoder, None, inferred_x_T, z_manipulated,
            stop_percent=0.0)
