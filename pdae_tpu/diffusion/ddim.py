"""DDIM sub-sequence sampling/encoding as single fused XLA programs.

The reference drives each DDIM step from Python (one kernel-launch round per
UNet call, ``/root/reference/diffusion/ddim.py:57-88,110-147``).  Here every
loop is a ``jax.lax.scan`` over the timestep axis with the model forward
inlined, so a DDIM-100 or DDIM-1000 run compiles to ONE XLA program and the
TPU never returns to the host between steps.

Math parity notes (vs reference ddim.py):
  * sampling loop visits i = num_steps .. 1, encoding i = 0 .. num_steps-1
  * the model always receives the *original* time axis via timestep_map[i]
  * predicted x_0 is clamped to [-1, 1] and the noise recomputed from the
    clamped x_0 before stepping (ddim.py:43-55)
  * the shift variants subtract sqrt(1-abar_t) * gradient from the predicted
    noise (ddim.py:94-96) -- a different coefficient convention from the
    training loss (see gaussian.py), both reproduced exactly.
  * ``stop_percent``: shift active only while (i-1) >= int(stop_percent*steps)
    (ddim.py:115-119).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .schedules import DDIMSchedule


def _bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a scalar to broadcast over an ndim-dimensional batch array."""
    return v.reshape((1,) * ndim)


def _predict_x0_and_renoise(dds: DDIMSchedule, x_t, i, predicted_noise,
                            clip_x0: bool = True):
    """Shared DDIM step math: predict x_0, clamp, recompute noise.

    Mirrors reference ddim.py:46-51.
    """
    nd = x_t.ndim
    sr = _bcast(dds.sqrt_recip_alphas_cumprod[i], nd)
    srm1 = _bcast(dds.sqrt_recip_alphas_cumprod_m1[i], nd)
    predicted_x_0 = sr * x_t - srm1 * predicted_noise
    if clip_x0:
        predicted_x_0 = jnp.clip(predicted_x_0, -1.0, 1.0)
    new_predicted_noise = (sr * x_t - predicted_x_0) / srm1
    return predicted_x_0, new_predicted_noise


def _step_to_prev(dds: DDIMSchedule, predicted_x_0, new_noise, i, nd):
    abar_prev = _bcast(dds.alphas_cumprod_prev[i], nd)
    return predicted_x_0 * jnp.sqrt(abar_prev) + jnp.sqrt(1.0 - abar_prev) * new_noise


def _step_to_next(dds: DDIMSchedule, predicted_x_0, new_noise, i, nd):
    abar_next = _bcast(dds.alphas_cumprod_next[i], nd)
    return predicted_x_0 * jnp.sqrt(abar_next) + jnp.sqrt(1.0 - abar_next) * new_noise


def _t_vec(dds: DDIMSchedule, i, batch: int) -> jnp.ndarray:
    """Map loop index i to the original time axis, broadcast to the batch."""
    return jnp.full((batch,), 0, jnp.int32) + dds.timestep_map[i]


def ddim_sample_loop(dds: DDIMSchedule, denoise_fn: Callable, x_T,
                     condition=None):
    """Deterministic DDIM sampling x_T -> x_0 (reference ddim.py:57-64)."""
    n = dds.num_steps
    batch = x_T.shape[0]

    def body(x, i):
        predicted_noise = denoise_fn(x, _t_vec(dds, i, batch), condition)
        x0, eps = _predict_x0_and_renoise(dds, x, i, predicted_noise)
        return _step_to_prev(dds, x0, eps, i, x.ndim), None

    x, _ = jax.lax.scan(body, x_T, jnp.arange(n, 0, -1))
    return x


def ddim_encode_loop(dds: DDIMSchedule, denoise_fn: Callable, x_0,
                     condition=None):
    """Deterministic DDIM encoding x_0 -> x_T (reference ddim.py:81-88)."""
    n = dds.num_steps
    batch = x_0.shape[0]

    def body(x, i):
        predicted_noise = denoise_fn(x, _t_vec(dds, i, batch), condition)
        x0, eps = _predict_x0_and_renoise(dds, x, i, predicted_noise)
        return _step_to_next(dds, x0, eps, i, x.ndim), None

    x, _ = jax.lax.scan(body, x_0, jnp.arange(0, n))
    return x


def _shifted_noise(dds: DDIMSchedule, predicted_noise, gradient, i, nd,
                   use_shift):
    """eps - sqrt(1-abar_t) * g, gated by use_shift (ddim.py:94-96,119)."""
    coef = _bcast(dds.sqrt_one_minus_alphas_cumprod[i], nd)
    shifted = predicted_noise - coef * gradient
    return jnp.where(use_shift, shifted, predicted_noise)


def shift_ddim_sample_loop(dds: DDIMSchedule, decoder: Callable, z, x_T,
                           stop_percent: float = 0.0):
    """PDAE shift-DDIM sampling (reference ddim.py:110-120).

    ``decoder(x, t, z) -> (predicted_noise, gradient)``.
    """
    n = dds.num_steps
    batch = x_T.shape[0]
    stop_step = int(stop_percent * n)

    def body(x, i):
        predicted_noise, gradient = decoder(x, _t_vec(dds, i, batch), z)
        use_shift = (i - 1) >= stop_step
        eps = _shifted_noise(dds, predicted_noise, gradient, i, x.ndim, use_shift)
        x0, eps = _predict_x0_and_renoise(dds, x, i, eps)
        return _step_to_prev(dds, x0, eps, i, x.ndim), None

    x, _ = jax.lax.scan(body, x_T, jnp.arange(n, 0, -1))
    return x


def shift_ddim_encode_loop(dds: DDIMSchedule, decoder: Callable, z, x_0):
    """PDAE shift-DDIM encoding (reference ddim.py:140-147)."""
    n = dds.num_steps
    batch = x_0.shape[0]

    def body(x, i):
        predicted_noise, gradient = decoder(x, _t_vec(dds, i, batch), z)
        eps = _shifted_noise(dds, predicted_noise, gradient, i, x.ndim, True)
        x0, eps = _predict_x0_and_renoise(dds, x, i, eps)
        return _step_to_next(dds, x0, eps, i, x.ndim), None

    x, _ = jax.lax.scan(body, x_0, jnp.arange(0, n))
    return x


def shift_ddim_trajectory_interpolation(dds: DDIMSchedule, decoder: Callable,
                                        z_1, z_2, x_T, alpha):
    """Blend the gradients from two latents at every step (ddim.py:149-174)."""
    n = dds.num_steps
    batch = x_T.shape[0]

    def body(x, i):
        t = _t_vec(dds, i, batch)
        predicted_noise, gradient_1 = decoder(x, t, z_1)
        _, gradient_2 = decoder(x, t, z_2)
        gradient = (1.0 - alpha) * gradient_1 + alpha * gradient_2
        eps = _shifted_noise(dds, predicted_noise, gradient, i, x.ndim, True)
        x0, eps = _predict_x0_and_renoise(dds, x, i, eps)
        return _step_to_prev(dds, x0, eps, i, x.ndim), None

    x, _ = jax.lax.scan(body, x_T, jnp.arange(n, 0, -1))
    return x


def latent_ddim_sample_loop(dds: DDIMSchedule, latent_denoise_fn: Callable,
                            z_T):
    """Latent-space DDIM sampling loop.

    NOTE: the reference's loop (ddim.py:200-207) calls the *generic*
    ``ddim_sample`` (with x_0 clamped to [-1,1]) rather than the unclamped
    ``latent_ddim_sample`` it defines above it; we reproduce the called path.
    The latent_denoise_fn takes no condition.
    """
    return ddim_sample_loop(dds, lambda x, t, _c: latent_denoise_fn(x, t), z_T)


def latent_ddim_sample_loop_unclamped(dds: DDIMSchedule,
                                      latent_denoise_fn: Callable, z_T):
    """The unclamped variant the reference defines but does not call
    (ddim.py:178-198), kept for completeness."""
    n = dds.num_steps
    batch = z_T.shape[0]

    def body(z, i):
        predicted_noise = latent_denoise_fn(z, _t_vec(dds, i, batch))
        z0, _ = _predict_x0_and_renoise(dds, z, i, predicted_noise, clip_x0=False)
        # steps with the *original* predicted noise (not recomputed)
        nxt = _step_to_prev(dds, z0, predicted_noise, i, z.ndim)
        return nxt, None

    z, _ = jax.lax.scan(body, z_T, jnp.arange(n, 0, -1))
    return z
