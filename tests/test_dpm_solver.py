"""DPM-Solver++(2M) tests (pdae_tpu/diffusion/dpm_solver.py).

Three layers of evidence:
  * order=1 is algebraically the same update as the DDIM loops (plain,
    shift, latent) — exact cross-checks against ddim.py on the same grid.
  * order=2 really is second-order: on an analytic Gaussian diffusion the
    probability-flow ODE has a closed-form solution, and the measured
    error halves ~4x per grid doubling (vs ~2x for DDIM), with a large
    absolute advantage at equal NFE.
  * the "dpm<N>" style strings dispatch through GaussianDiffusion wherever
    a decode OR encode ddim_style is accepted.
  * the encode (inversion) direction: order=1 on the t grid IS
    ddim_encode_loop exactly (plain and shift), order-2 convergence holds
    against the closed-form Gaussian inversion, and a dpm encode->decode
    round trip reconstructs x_0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.diffusion import GaussianDiffusion, ddim, dpm_solver
from pdae_tpu.diffusion.schedules import extract

pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)


def _toy_denoise_fn(x, t, condition=None):
    tt = (t.astype(jnp.float32) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
    return 0.3 * jnp.tanh(x) + 0.1 * jnp.sin(3.0 * x) * tt


def _toy_decoder(x, t, z):
    eps = _toy_denoise_fn(x, t)
    zz = jnp.mean(z, axis=-1).reshape((-1,) + (1,) * (x.ndim - 1))
    g = 0.05 * jnp.cos(x) * (1.0 + zz)
    return eps, g


def test_order1_matches_ddim_loop():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    tables = gd.solver_tables("dpm10", spacing="t")
    got = dpm_solver.dpm_solver_sample_loop(tables, _toy_denoise_fn, x_T,
                                            order=1)
    want = ddim.ddim_sample_loop(gd.ddim_schedule("ddim10"), _toy_denoise_fn,
                                 x_T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_shift_order1_matches_shift_ddim_loop():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    tables = gd.solver_tables("dpm10", spacing="t")
    dds = gd.ddim_schedule("ddim10")
    for sp in (0.0, 0.3, 1.0):
        got = dpm_solver.shift_dpm_solver_sample_loop(
            tables, _toy_decoder, z, x_T, stop_percent=sp, order=1)
        want = ddim.shift_ddim_sample_loop(dds, _toy_decoder, z, x_T,
                                           stop_percent=sp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6, err_msg=f"sp={sp}")


def test_latent_order1_matches_latent_ddim_loop():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    z_T = 2.0 * jax.random.normal(jax.random.PRNGKey(3), (3, 16))
    f = lambda z, t: 0.2 * jnp.tanh(z)
    tables = gd.latent_solver_tables("dpm10", spacing="t")
    got = dpm_solver.latent_dpm_solver_sample_loop(tables, f, z_T, order=1)
    want = ddim.latent_ddim_sample_loop(gd.latent_ddim_schedule("ddim10"),
                                        f, z_T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# analytic second-order accuracy
# --------------------------------------------------------------------- #

_MU, _SVAR = 0.1, 0.04   # data ~ N(mu, svar*I); values keep x0-hat in [-1,1]


def _gaussian_eps_fn(schedule):
    """Exact epsilon-predictor for x_0 ~ N(mu, svar*I): the posterior mean
    E[x_0|x_t] is closed-form, so the model — and hence the probability-flow
    ODE the solvers integrate — is analytic."""

    def eps(x, t, condition=None):
        a = extract(schedule.sqrt_alphas_cumprod, t, x.ndim)
        sig = extract(schedule.sqrt_one_minus_alphas_cumprod, t, x.ndim)
        x0_hat = (_SVAR * a * x + sig ** 2 * _MU) / (a ** 2 * _SVAR + sig ** 2)
        return (x - a * x0_hat) / sig

    return eps


def _gaussian_exact_x0(gd, x_T):
    """Closed-form PF-ODE flow for Gaussian marginals N(a_t*mu, std_t^2):
    the (coordinate-wise monotone, affine) map
    x(t) = a_t*mu + (std_t/std_s)*(x(s) - a_s*mu).  Both grid spacings pin
    the top point to t=T-1 and the bottom to t=0, and for an affine flow
    the exact endpoint depends only on those levels."""
    abar = np.asarray(gd.schedule.alphas_cumprod, dtype=np.float64)
    a_top, a_bot = np.sqrt(abar[-1]), np.sqrt(abar[0])
    std = lambda ab: np.sqrt(ab * _SVAR + (1.0 - ab))
    return (a_bot * _MU
            + (std(abar[0]) / std(abar[-1])) * (np.asarray(x_T) - a_top * _MU))


def _gaussian_errs(gd, x_T, cases):
    eps_fn = _gaussian_eps_fn(gd.schedule)
    exact = _gaussian_exact_x0(gd, x_T)
    errs = {}
    for spacing, order, n in cases:
        tables = gd.solver_tables(f"dpm{n}", spacing=spacing)
        got = np.asarray(dpm_solver.dpm_solver_sample_loop(
            tables, eps_fn, jnp.asarray(x_T, jnp.float32), order=order))
        errs[(spacing, order, n)] = float(np.max(np.abs(got - exact)))
    return errs


def test_second_order_convergence_on_analytic_gaussian():
    """On the smooth uniform-t grid the 2M solver's error falls decisively
    faster than first order's as the grid refines (measured ~46x vs ~6x
    from n=10 to n=80)."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (4, 8))) * 0.7
    errs = _gaussian_errs(gd, x_T, [("t", o, n) for o in (1, 2)
                                    for n in (10, 80)])
    r1 = errs[("t", 1, 10)] / errs[("t", 1, 80)]
    r2 = errs[("t", 2, 10)] / errs[("t", 2, 80)]
    assert r2 > 3.0 * r1, errs
    assert r2 > 20.0, errs
    assert errs[("t", 2, 80)] < errs[("t", 1, 80)] / 3, errs


def test_lambda_grid_advantage_on_analytic_gaussian():
    """The default uniform-lambda grid dominates at low NFE: order-2 on
    dpm10 measures ~150x more accurate than the same solver on the t grid
    (whose final step spans ~3.5 lambda), and ~10x+ better than first
    order on its own grid."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (4, 8))) * 0.7
    errs = _gaussian_errs(gd, x_T,
                          [("lambda", 1, 10), ("lambda", 2, 10),
                           ("lambda", 2, 20), ("t", 2, 10)])
    assert errs[("lambda", 2, 10)] < errs[("t", 2, 10)] / 20, errs
    assert errs[("lambda", 2, 10)] < errs[("lambda", 1, 10)] / 10, errs
    # tiny absolute endpoint error at 10 and 20 NFE
    assert errs[("lambda", 2, 10)] < 5e-3, errs
    assert errs[("lambda", 2, 20)] < 1e-2, errs


def test_order2_differs_from_order1_and_is_finite():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 3))
    tables = gd.solver_tables("dpm10")
    a = dpm_solver.dpm_solver_sample_loop(tables, _toy_denoise_fn, x_T, order=2)
    b = dpm_solver.dpm_solver_sample_loop(tables, _toy_denoise_fn, x_T, order=1)
    assert np.all(np.isfinite(np.asarray(a)))
    assert float(jnp.max(jnp.abs(a - b))) > 1e-5


# --------------------------------------------------------------------- #
# dispatch through GaussianDiffusion
# --------------------------------------------------------------------- #

def test_gaussian_diffusion_style_dispatch():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 16))

    got = gd.ddim_sample("dpm10", _toy_denoise_fn, x_T)
    want = dpm_solver.dpm_solver_sample_loop(gd.solver_tables("dpm10"),
                                             _toy_denoise_fn, x_T, order=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    got = gd.representation_learning_ddim_sample(
        "dpm10", None, _toy_decoder, None, x_T, z=z, stop_percent=0.3)
    want = dpm_solver.shift_dpm_solver_sample_loop(
        gd.solver_tables("dpm10"), _toy_decoder, z, x_T, stop_percent=0.3,
        order=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_latent_diffusion_sample_accepts_solver_styles():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_T = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 3))
    f = lambda z, t: 0.2 * jnp.tanh(z)
    out = gd.latent_diffusion_sample(
        jax.random.PRNGKey(9), "dpm10", "dpm10", f, _toy_decoder, x_T,
        0.0, 1.0, latent_dim=16)
    assert out.shape == x_T.shape
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------------------------------- #
# encode (fast DDIM inversion)
# --------------------------------------------------------------------- #

def test_encode_order1_matches_ddim_encode_loop():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(10),
                                           (2, 8, 8, 3)))
    tables = gd.solver_tables("dpm10", spacing="t", direction="encode")
    got = dpm_solver.dpm_solver_encode_loop(tables, _toy_denoise_fn, x_0,
                                            order=1)
    want = ddim.ddim_encode_loop(gd.ddim_schedule("ddim10"), _toy_denoise_fn,
                                 x_0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_shift_encode_order1_matches_shift_ddim_encode_loop():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(11),
                                           (2, 8, 8, 3)))
    z = jax.random.normal(jax.random.PRNGKey(12), (2, 16))
    tables = gd.solver_tables("dpm10", spacing="t", direction="encode")
    got = dpm_solver.shift_dpm_solver_encode_loop(tables, _toy_decoder, z,
                                                  x_0, order=1)
    want = ddim.shift_ddim_encode_loop(gd.ddim_schedule("ddim10"),
                                       _toy_decoder, z, x_0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def _gaussian_exact_x_T(gd, x_0):
    """Closed-form inverse of the affine Gaussian PF-ODE flow: from the
    t=0 level up to the t=T-1 level (see _gaussian_exact_x0)."""
    abar = np.asarray(gd.schedule.alphas_cumprod, dtype=np.float64)
    a_top, a_bot = np.sqrt(abar[-1]), np.sqrt(abar[0])
    std = lambda ab: np.sqrt(ab * _SVAR + (1.0 - ab))
    return (a_top * _MU
            + (std(abar[-1]) / std(abar[0])) * (np.asarray(x_0) - a_bot * _MU))


def test_encode_second_order_on_analytic_gaussian():
    """Inversion accuracy on the closed-form Gaussian PF-ODE.  Absolute
    errors run larger than decode's because inversion flows toward
    INCREASING variance (early local error is amplified by ~std_T/std_0
    instead of contracted), but the order structure is intact — measured:
    order-2 improves ~39x from n=10 to n=80 vs order-1's ~7x, the lambda
    grid beats the t grid ~9x at dpm10, and a dpm20 encode (0.032) is 5x
    more accurate than an 80-step order-1 t-grid encode (0.17) at 4x
    fewer NFE."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    eps_fn = _gaussian_eps_fn(gd.schedule)
    x_0 = np.asarray(jax.random.normal(jax.random.PRNGKey(13), (4, 8))) * 0.2
    x_0 = jnp.asarray(x_0 + _MU, jnp.float32)
    exact = _gaussian_exact_x_T(gd, x_0)
    errs = {}
    for spacing, order, n in [("lambda", 1, 10), ("lambda", 1, 80),
                              ("lambda", 2, 10), ("lambda", 2, 20),
                              ("lambda", 2, 80), ("t", 2, 10), ("t", 1, 80)]:
        tables = gd.solver_tables(f"dpm{n}", spacing=spacing,
                                  direction="encode")
        got = np.asarray(dpm_solver.dpm_solver_encode_loop(
            tables, eps_fn, x_0, order=order))
        errs[(spacing, order, n)] = float(np.max(np.abs(got - exact)))
    r1 = errs[("lambda", 1, 10)] / errs[("lambda", 1, 80)]
    r2 = errs[("lambda", 2, 10)] / errs[("lambda", 2, 80)]
    assert r2 > 3.0 * r1, errs                        # real second order
    assert errs[("lambda", 2, 10)] < errs[("lambda", 1, 10)] / 3, errs
    assert errs[("lambda", 2, 10)] < errs[("t", 2, 10)] / 5, errs
    assert errs[("lambda", 2, 20)] < 0.05, errs        # dpm20 absolute
    # the headline: dpm20 encode beats an 80-step first-order t-grid
    # encode (DDIM-inversion-class) at 4x fewer NFE
    assert errs[("lambda", 2, 20)] < errs[("t", 1, 80)] / 3, errs


def test_encode_decode_roundtrip_on_analytic_gaussian():
    """dpm encode -> dpm decode reconstructs x_0 (the autoencoding_eval
    pattern at 5x fewer NFE per leg)."""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    eps_fn = _gaussian_eps_fn(gd.schedule)
    x_0 = np.asarray(jax.random.normal(jax.random.PRNGKey(14), (4, 8))) * 0.2
    x_0 = jnp.asarray(x_0 + _MU, jnp.float32)
    x_T = dpm_solver.dpm_solver_encode_loop(
        gd.solver_tables("dpm20", direction="encode"), eps_fn, x_0)
    back = dpm_solver.dpm_solver_sample_loop(
        gd.solver_tables("dpm20"), eps_fn, x_T)
    assert float(jnp.max(jnp.abs(back - x_0))) < 3e-2


def test_roundtrip_pattern_matched_grid_cancellation():
    """The structural fact behind the chip-measured fast-eval trade
    (PERF.md "The fast-eval trade, quantified"): on a NONLINEAR model
    the dpm20+dpm20 roundtrip beats the reference's ddim1000-encode +
    ddim100-decode autoencoding pattern (autoencoding_eval.py) at 27.5x
    fewer NFE — and the advantage is matched-grid cancellation, not
    per-leg accuracy: upgrading EITHER leg of the matched pair to a
    finer grid makes the roundtrip WORSE, because the second-order
    multistep traversed both ways on one λ-grid is approximately
    self-inverse.  (Measured on this toy: dpm20+dpm20 1.8e-3 RMSE vs
    ddim1000+ddim100 6.5e-3, dpm80+dpm20 5.1e-3, dpm20+dpm80 5.7e-3,
    matched-fine dpm80+dpm80 1.4e-4; first-order DDIM does NOT cancel —
    ddim100+ddim100 1.2e-2.)"""
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(20),
                                           (4, 8, 8, 3)))

    def rt_rmse(enc, dec):
        x_T = gd.ddim_encode(enc, _toy_denoise_fn, x_0)
        back = gd.ddim_sample(dec, _toy_denoise_fn, x_T)
        return float(jnp.sqrt(jnp.mean((back - x_0) ** 2)))

    reference = rt_rmse("ddim1000", "ddim100")   # the README pattern
    fast = rt_rmse("dpm20", "dpm20")             # autoencoding_eval_fast
    assert fast < reference / 2, (fast, reference)
    # cancellation: a MORE accurate encode or decode leg breaks the pair
    assert fast < rt_rmse("dpm80", "dpm20") / 2
    assert fast < rt_rmse("dpm20", "dpm80") / 2
    # matched finer grid keeps cancelling (not a dpm20 coincidence)
    assert rt_rmse("dpm80", "dpm80") < fast / 5
    # first-order DDIM on a matched grid has no such property
    assert rt_rmse("ddim100", "ddim100") > reference


def test_encode_style_dispatch():
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    x_0 = 0.5 * jnp.tanh(jax.random.normal(jax.random.PRNGKey(15),
                                           (2, 8, 8, 3)))
    z = jax.random.normal(jax.random.PRNGKey(16), (2, 16))

    got = gd.ddim_encode("dpm10", _toy_denoise_fn, x_0)
    want = dpm_solver.dpm_solver_encode_loop(
        gd.solver_tables("dpm10", direction="encode"), _toy_denoise_fn, x_0,
        order=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    got = gd.representation_learning_ddim_encode(
        "dpm10", None, _toy_decoder, x_0, z=z)
    want = dpm_solver.shift_dpm_solver_encode_loop(
        gd.solver_tables("dpm10", direction="encode"), _toy_decoder, z, x_0,
        order=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # full autoencoding composes through both dispatches
    out = gd.representation_learning_autoencoding(
        "dpm10", "dpm10", lambda x: jnp.ones((x.shape[0], 16)), _toy_decoder,
        x_0)
    assert out.shape == x_0.shape
    assert np.all(np.isfinite(np.asarray(out)))
