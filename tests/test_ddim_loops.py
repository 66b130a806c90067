"""Behavioral tests of the scan-based DDIM/DDPM loops against a plain
python-loop implementation of the same update equations."""

import jax
import jax.numpy as jnp
import numpy as np

from pdae_tpu.diffusion import GaussianDiffusion, ddim, make_ddim_schedule

pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)


def py_ddim_sample_loop(dds, denoise_fn, x_T, condition=None):
    """Straightforward per-step python loop (mirrors the update equations)."""
    x = np.asarray(x_T)
    n = dds.num_steps
    tm = np.asarray(dds.timestep_map)
    sr = np.asarray(dds.sqrt_recip_alphas_cumprod)
    srm1 = np.asarray(dds.sqrt_recip_alphas_cumprod_m1)
    abar_prev = np.asarray(dds.alphas_cumprod_prev)
    for i in range(n, 0, -1):
        t = np.full((x.shape[0],), tm[i], np.int32)
        eps = np.asarray(denoise_fn(jnp.asarray(x), jnp.asarray(t), condition))
        x0 = np.clip(sr[i] * x - srm1[i] * eps, -1, 1)
        new_eps = (sr[i] * x - x0) / srm1[i]
        x = x0 * np.sqrt(abar_prev[i]) + np.sqrt(1 - abar_prev[i]) * new_eps
    return x


def py_shift_ddim_sample_loop(dds, decoder, z, x_T, stop_percent=0.0):
    x = np.asarray(x_T)
    n = dds.num_steps
    stop_step = int(stop_percent * n)
    tm = np.asarray(dds.timestep_map)
    s1m = np.asarray(dds.sqrt_one_minus_alphas_cumprod)
    sr = np.asarray(dds.sqrt_recip_alphas_cumprod)
    srm1 = np.asarray(dds.sqrt_recip_alphas_cumprod_m1)
    abar_prev = np.asarray(dds.alphas_cumprod_prev)
    for i in range(n, 0, -1):
        t = np.full((x.shape[0],), tm[i], np.int32)
        eps, g = decoder(jnp.asarray(x), jnp.asarray(t), z)
        eps, g = np.asarray(eps), np.asarray(g)
        if (i - 1) >= stop_step:
            eps = eps - s1m[i] * g
        x0 = np.clip(sr[i] * x - srm1[i] * eps, -1, 1)
        new_eps = (sr[i] * x - x0) / srm1[i]
        x = x0 * np.sqrt(abar_prev[i]) + np.sqrt(1 - abar_prev[i]) * new_eps
    return x


def _toy_denoise_fn(x, t, condition=None):
    """Deterministic toy model: time + spatial mixing, no params."""
    tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.3 * jnp.tanh(x) + 0.1 * jnp.sin(3.0 * x) * tt


def _toy_decoder(x, t, z):
    eps = _toy_denoise_fn(x, t)
    zz = jnp.mean(z, axis=-1).reshape((-1,) + (1,) * (x.ndim - 1))
    g = 0.05 * jnp.cos(x) * (1.0 + zz)
    return eps, g


def test_ddim_sample_loop_matches_python():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.ddim_schedule("ddim10")
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(rng, (2, 8, 8, 3))
    got = np.asarray(ddim.ddim_sample_loop(dds, _toy_denoise_fn, x_T))
    want = py_ddim_sample_loop(dds, _toy_denoise_fn, x_T)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ddim_encode_then_decode_inverts():
    """DDIM encode followed by sample approximately reconstructs the input
    for a smooth toy model (core PDAE autoencoding property)."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    enc = gd.ddim_schedule("ddim200")
    dec = gd.ddim_schedule("ddim200")
    x_0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3)))
    x_T = ddim.ddim_encode_loop(enc, _toy_denoise_fn, x_0)
    x_rec = ddim.ddim_sample_loop(dec, _toy_denoise_fn, x_T)
    err = float(jnp.mean((x_rec - x_0) ** 2))
    assert err < 1e-3, err


def test_shift_ddim_sample_matches_python_and_stop_percent():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.ddim_schedule("ddim10")
    key = jax.random.PRNGKey(2)
    x_T = jax.random.normal(key, (2, 8, 8, 3))
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 16))
    for sp in (0.0, 0.3, 1.0):
        got = np.asarray(ddim.shift_ddim_sample_loop(dds, _toy_decoder, z, x_T,
                                                     stop_percent=sp))
        want = py_shift_ddim_sample_loop(dds, _toy_decoder, z, x_T, stop_percent=sp)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # stop_percent=1.0 disables the shift everywhere except... i-1 >= n never
    # holds, so it must equal the plain ddim loop on eps alone
    got_noshift = np.asarray(ddim.shift_ddim_sample_loop(
        dds, _toy_decoder, z, x_T, stop_percent=1.0))
    want_plain = np.asarray(ddim.ddim_sample_loop(dds, _toy_denoise_fn, x_T))
    np.testing.assert_allclose(got_noshift, want_plain, rtol=1e-5, atol=1e-6)


def test_shift_encode_loop_runs_and_differs_from_plain():
    gd = GaussianDiffusion({"timesteps": 100, "betas_type": "linear"})
    dds = gd.ddim_schedule("ddim10")
    x_0 = 0.3 * jnp.ones((1, 8, 8, 3))
    z = jnp.ones((1, 16))
    a = ddim.shift_ddim_encode_loop(dds, _toy_decoder, z, x_0)
    b = ddim.ddim_encode_loop(dds, _toy_denoise_fn, x_0)
    assert a.shape == x_0.shape
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4  # shift changed the path


def test_q_sample_and_posterior_mean():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_0 = jnp.ones((4, 2, 2, 1)) * 0.5
    noise = jnp.ones_like(x_0)
    t = jnp.array([0, 10, 500, 999], jnp.int32)
    got = np.asarray(gd.q_sample(x_0, t, noise))
    s = gd.schedule
    for b, tt in enumerate([0, 10, 500, 999]):
        want = (float(s.sqrt_alphas_cumprod[tt]) * 0.5
                + float(s.sqrt_one_minus_alphas_cumprod[tt]) * 1.0)
        np.testing.assert_allclose(got[b], want, rtol=1e-5)
    # posterior mean of (x_0=x_t=x) at t: coef_x0*x + coef_xt*x
    pm = np.asarray(gd.q_posterior_mean(x_0, x_0, t))
    for b, tt in enumerate([0, 10, 500, 999]):
        want = 0.5 * (float(s.x_0_posterior_mean_x_0_coef[tt])
                      + float(s.x_0_posterior_mean_x_t_coef[tt]))
        np.testing.assert_allclose(pm[b], want, rtol=1e-5)


def test_regular_ddpm_sample_shapes_and_determinism():
    gd = GaussianDiffusion({"timesteps": 50, "betas_type": "linear"})
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    a = gd.regular_ddpm_sample(rng, _toy_denoise_fn, x_T)
    b = gd.regular_ddpm_sample(rng, _toy_denoise_fn, x_T)
    assert a.shape == x_T.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = gd.regular_ddpm_sample(jax.random.PRNGKey(9), _toy_denoise_fn, x_T)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-5


def test_latent_loop_uses_clamped_path():
    """The reference calls the generic (clamped) ddim_sample for latents;
    verify our latent loop equals the clamped loop, not the unclamped one."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.latent_ddim_schedule("ddim10")
    z_T = 5.0 * jax.random.normal(jax.random.PRNGKey(4), (3, 16))
    f = lambda z, t: 0.2 * jnp.tanh(z)
    a = ddim.latent_ddim_sample_loop(dds, f, z_T)
    b = ddim.ddim_sample_loop(dds, lambda x, t, c: f(x, t), z_T)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    u = ddim.latent_ddim_sample_loop_unclamped(dds, f, z_T)
    assert float(jnp.max(jnp.abs(a - u))) > 1e-4


def test_gap_measure_shapes():
    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})
    x_0 = 0.1 * jnp.ones((2, 8, 8, 3))
    enc = lambda x: jnp.mean(x, axis=(1, 2))
    gaps, ae_gaps = gd.representation_learning_gap_measure(
        jax.random.PRNGKey(0), enc, _toy_decoder, x_0)
    assert gaps.shape == (20,) and ae_gaps.shape == (20,)
    assert np.all(np.isfinite(np.asarray(gaps)))


def test_manipulation_bce_matches_closed_form():
    gd = GaussianDiffusion({"timesteps": 10, "betas_type": "linear"})
    x_0 = jnp.ones((4, 8, 8, 3))
    enc = lambda x: jnp.mean(x, axis=(1, 2, 3), keepdims=False)[:, None] * jnp.ones((1, 6))
    W = jnp.arange(12, dtype=jnp.float32).reshape(2, 6) / 12.0
    clf = lambda z: z @ W.T
    label = jnp.array([[1, -1], [1, 1], [-1, -1], [1, -1]], jnp.float32)
    out = gd.manipulation_train_one_batch(clf, enc, x_0, label, 0.0, 1.0)
    logits = np.asarray(clf(enc(x_0)))
    gt = (np.asarray(label) > 0).astype(np.float64)
    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    want = -(gt * np.log(p) + (1 - gt) * np.log(1 - p)).mean()
    np.testing.assert_allclose(float(out["bce_loss"]), want, rtol=1e-4)


def test_regular_ddpm_sample_learn_sigma_split():
    """2x-channel model output exercises the learned_range variance path
    (gaussian_diffusion.py:223-227,148-154)."""
    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})

    def denoise_learned(x, t, c=None):
        eps = _toy_denoise_fn(x, t)
        learned_range = jnp.zeros_like(x)  # mid of [min_var, max_var]
        return jnp.concatenate([eps, learned_range], axis=-1)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    out = gd.regular_ddpm_sample(jax.random.PRNGKey(1), denoise_learned, x_T)
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_x_0_clip_p_sample_matches_formula():
    gd = GaussianDiffusion({"timesteps": 100, "betas_type": "linear"})
    x_t = 0.3 * jnp.ones((2, 4, 4, 1))
    t = jnp.array([5, 50], jnp.int32)
    eps = 0.1 * jnp.ones_like(x_t)
    rng = jax.random.PRNGKey(0)
    out = gd.x_0_clip_p_sample(rng, x_t, t, eps)
    # manual: x0 = clip(sr*x - srm1*eps); mean = q_posterior_mean; noise added
    s = gd.schedule
    x0 = np.clip(np.asarray(s.sqrt_recip_alphas_cumprod)[[5, 50], None, None, None] * 0.3
                 - np.asarray(s.sqrt_recip_alphas_cumprod_m1)[[5, 50], None, None, None] * 0.1,
                 -1, 1)
    mean = (np.asarray(s.x_0_posterior_mean_x_0_coef)[[5, 50], None, None, None] * x0
            + np.asarray(s.x_0_posterior_mean_x_t_coef)[[5, 50], None, None, None] * 0.3)
    noise = np.asarray(jax.random.normal(rng, x_t.shape))
    lv = np.asarray(s.posterior_log_variance_clipped)[[5, 50], None, None, None]
    want = mean + np.exp(0.5 * lv) * noise
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
