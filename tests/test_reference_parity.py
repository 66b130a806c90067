"""Loop-level numerical parity: our diffusion workloads vs the actual torch
reference implementation, side by side on identical converted weights.

This is the strongest verification available in this environment: the torch
reference (/root/reference) is importable, so every sampler/trainer entry
point of our ``GaussianDiffusion`` is run against the reference's
``GaussianDiffusion``/``DDIM`` (gaussian_diffusion.py:98-443, ddim.py:43-207)
on the SAME converted random weights and the SAME inputs/noise, asserting
the produced trajectories (sampled images, encoded x_T, gap curves, losses)
agree.  Internal torch RNG draws are intercepted via monkeypatching so both
sides consume identical noise.

Forward-model parity alone (test_torch_convert.py) would not catch an
off-by-one in DDIM respacing or a shift-coefficient convention error --
these tests would.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from pdae_tpu.diffusion import GaussianDiffusion
from pdae_tpu.models import MLPSkipNet, ShiftUNet, UNet
from pdae_tpu.utils.torch_convert import (convert_mlp_skip_net_state_dict,
                                          convert_unet_state_dict)

# small-but-real geometry: 16px images, attention at 8x8
UNET_CFG = dict(
    input_channel=3, base_channel=32, channel_multiplier=[1, 2],
    num_residual_blocks_of_a_block=2, attention_resolutions=[2],
    num_heads=2, head_channel=-1, use_new_attention_order=False, dropout=0.0)
LATENT_DIM = 16
T = 100  # original diffusion timesteps (small for test speed)
B = 2
IMG = 16

_rs = np.random.RandomState(20240816)
ENC_W = _rs.randn(3, LATENT_DIM).astype(np.float32)  # matrix "encoder"
LAT_MEAN = _rs.randn(LATENT_DIM).astype(np.float32)
LAT_STD = (0.5 + _rs.rand(LATENT_DIM)).astype(np.float32)


def to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def to_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def torch_encoder(x):
    """Deterministic stand-in encoder: spatial mean -> fixed matrix.

    Keeps these tests about the *diffusion loops*; the real encoder's forward
    parity is covered by test_torch_convert.py."""
    return x.mean(dim=[2, 3]) @ torch.from_numpy(ENC_W)


def jax_encoder(x):
    return x.mean(axis=(1, 2)) @ jnp.asarray(ENC_W)


@pytest.fixture(scope="module")
def env():
    from diffusion.gaussian_diffusion import GaussianDiffusion as RefGD
    from model.mlp_skip_net import MLPSkipNet as TorchMLP
    from model.shift_unet import ShiftUNet as TorchShiftUNet
    from model.unet import UNet as TorchUNet

    torch.manual_seed(7)
    cfg = {"timesteps": T, "betas_type": "linear"}
    ref = RefGD(cfg, torch.device("cpu"))
    ours = GaussianDiffusion(cfg)

    t_unet = TorchUNet(**UNET_CFG).eval()
    t_dec = TorchShiftUNet(latent_dim=LATENT_DIM, **UNET_CFG).eval()
    t_mlp = TorchMLP(input_channel=LATENT_DIM, model_channel=64, num_layers=4,
                     time_emb_channel=16, use_norm=True, dropout=0.0).eval()

    # CRITICAL: perturb the zero-initialized output convs (zero_module) on
    # the torch side before conversion.  A fresh UNet/ShiftUNet outputs
    # EXACTLY zero (verified), which would make every trajectory test blind
    # to the shift coefficients, stop_percent gating, and z-conditioning --
    # the very conventions this file exists to check.  With the
    # perturbation the models produce real (random) predictions on both
    # sides and any coefficient/sign/index error changes the trajectories.
    with torch.no_grad():
        for m in (t_unet, t_dec, t_mlp):
            for p_ in m.parameters():
                if float(p_.abs().max()) == 0.0:
                    p_.normal_(0.0, 0.05)

    jcfg = {**UNET_CFG, "channel_multiplier": (1, 2),
            "attention_resolutions": (2,)}
    j_unet = UNet(**jcfg)
    j_dec = ShiftUNet(latent_dim=LATENT_DIM, **jcfg)
    j_mlp = MLPSkipNet(input_channel=LATENT_DIM, model_channel=64,
                       num_layers=4, time_emb_channel=16, use_norm=True,
                       dropout=0.0)

    p_unet = convert_unet_state_dict(
        {k: v.numpy() for k, v in t_unet.state_dict().items()})
    p_dec = convert_unet_state_dict(
        {k: v.numpy() for k, v in t_dec.state_dict().items()})
    p_mlp = convert_mlp_skip_net_state_dict(
        {k: v.numpy() for k, v in t_mlp.state_dict().items()})

    def denoise_fn(x, t, condition=None):
        return j_unet.apply({"params": p_unet}, x, t, condition)

    def decoder(x, t, z):
        return j_dec.apply({"params": p_dec}, x, t, z)

    def latent_fn(z, t):
        return j_mlp.apply({"params": p_mlp}, z, t)

    return dict(ref=ref, ours=ours, t_unet=t_unet, t_dec=t_dec, t_mlp=t_mlp,
                denoise_fn=denoise_fn, decoder=decoder, latent_fn=latent_fn)


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(99)
    x = rs.randn(B, 3, IMG, IMG).astype(np.float32)
    x = np.clip(x, -1, 1)
    xT = rs.randn(B, 3, IMG, IMG).astype(np.float32)
    z = rs.randn(B, LATENT_DIM).astype(np.float32)
    z2 = rs.randn(B, LATENT_DIM).astype(np.float32)
    return dict(x=x, xT=xT, z=z, z2=z2)


def close(got_nhwc, want_nchw, atol=2e-3, what=""):
    got = np.asarray(got_nhwc)
    want = to_nhwc(want_nchw.detach().numpy())
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3,
                               err_msg=f"trajectory mismatch: {what}")


# --------------------------------------------------------------------- #
# deterministic sampler trajectories
# --------------------------------------------------------------------- #

def test_ddim_sample_trajectory(env, data):
    xT_t = torch.from_numpy(data["xT"])
    with torch.no_grad():
        want = env["ref"].ddim_sample("ddim10", env["t_unet"], xT_t)
    got = env["ours"].ddim_sample("ddim10", env["denoise_fn"],
                                  jnp.asarray(to_nhwc(data["xT"])))
    close(got, want, what="ddim_sample ddim10")


def test_ddim_encode_trajectory(env, data):
    x_t = torch.from_numpy(data["x"])
    with torch.no_grad():
        want = env["ref"].ddim_encode("ddim10", env["t_unet"], x_t)
    got = env["ours"].ddim_encode("ddim10", env["denoise_fn"],
                                  jnp.asarray(to_nhwc(data["x"])))
    close(got, want, what="ddim_encode ddim10")


@pytest.mark.parametrize("stop_percent", [0.0, 0.3])
def test_shift_ddim_sample_trajectory(env, data, stop_percent):
    with torch.no_grad():
        want = env["ref"].representation_learning_ddim_sample(
            "ddim10", None, env["t_dec"], None,
            torch.from_numpy(data["xT"]), z=torch.from_numpy(data["z"]),
            stop_percent=stop_percent)
    got = env["ours"].representation_learning_ddim_sample(
        "ddim10", None, env["decoder"], None,
        jnp.asarray(to_nhwc(data["xT"])), z=jnp.asarray(data["z"]),
        stop_percent=stop_percent)
    close(got, want, what=f"shift_ddim_sample stop={stop_percent}")


def test_shift_ddim_encode_trajectory(env, data):
    with torch.no_grad():
        want = env["ref"].representation_learning_ddim_encode(
            "ddim10", None, env["t_dec"], torch.from_numpy(data["x"]),
            z=torch.from_numpy(data["z"]))
    got = env["ours"].representation_learning_ddim_encode(
        "ddim10", None, env["decoder"], jnp.asarray(to_nhwc(data["x"])),
        z=jnp.asarray(data["z"]))
    close(got, want, what="shift_ddim_encode")


def test_autoencoding_trajectory(env, data):
    """Full encode->decode round trip, the SSIM-0.994 eval path."""
    with torch.no_grad():
        want = env["ref"].representation_learning_autoencoding(
            "ddim10", "ddim5", torch_encoder, env["t_dec"],
            torch.from_numpy(data["x"]))
    got = env["ours"].representation_learning_autoencoding(
        "ddim10", "ddim5", jax_encoder, env["decoder"],
        jnp.asarray(to_nhwc(data["x"])))
    close(got, want, what="autoencoding ddim10->ddim5")


def test_trajectory_interpolation(env, data):
    with torch.no_grad():
        want = env["ref"].representation_learning_ddim_trajectory_interpolation(
            "ddim10", env["t_dec"], torch.from_numpy(data["z"]),
            torch.from_numpy(data["z2"]), torch.from_numpy(data["xT"]),
            alpha=0.35)
    got = env["ours"].representation_learning_ddim_trajectory_interpolation(
        "ddim10", env["decoder"], jnp.asarray(data["z"]),
        jnp.asarray(data["z2"]), jnp.asarray(to_nhwc(data["xT"])), alpha=0.35)
    close(got, want, what="trajectory interpolation")


def test_manipulation_sample_trajectory(env, data):
    rs = np.random.RandomState(5)
    w = rs.randn(4, LATENT_DIM).astype(np.float32)
    with torch.no_grad():
        want = env["ref"].manipulation_sample(
            "ddim5", torch.from_numpy(w), torch_encoder, env["t_dec"],
            torch.from_numpy(data["x"]), torch.from_numpy(data["xT"]),
            torch.from_numpy(LAT_MEAN), torch.from_numpy(LAT_STD),
            class_id=2, scale=0.3)
    got = env["ours"].manipulation_sample(
        "ddim5", jnp.asarray(w), jax_encoder, env["decoder"],
        jnp.asarray(to_nhwc(data["x"])), jnp.asarray(to_nhwc(data["xT"])),
        jnp.asarray(LAT_MEAN), jnp.asarray(LAT_STD), class_id=2, scale=0.3)
    close(got, want, what="manipulation_sample")


def test_latent_diffusion_sample_trajectory(env, data, monkeypatch):
    """Full unconditional pipeline: z_T -> latent DDIM -> shift decode."""
    rs = np.random.RandomState(11)
    z_T = rs.randn(B, LATENT_DIM).astype(np.float32)

    real_randn = torch.randn

    def fake_randn(*shape, **kw):
        if tuple(shape) == (B, LATENT_DIM) or shape == ((B, LATENT_DIM),):
            return torch.from_numpy(z_T)
        return real_randn(*shape, **kw)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        want = env["ref"].latent_diffusion_sample(
            "ddim10", "ddim5", env["t_mlp"], env["t_dec"],
            torch.from_numpy(data["xT"]), torch.from_numpy(LAT_MEAN),
            torch.from_numpy(LAT_STD))
    got = env["ours"].latent_diffusion_sample(
        None, "ddim10", "ddim5", env["latent_fn"], env["decoder"],
        jnp.asarray(to_nhwc(data["xT"])), jnp.asarray(LAT_MEAN),
        jnp.asarray(LAT_STD), latent_dim=LATENT_DIM, z_T=jnp.asarray(z_T))
    close(got, want, what="latent_diffusion_sample")


# --------------------------------------------------------------------- #
# noise-injected diagnostics
# --------------------------------------------------------------------- #

def test_gap_measure_curves(env, data, monkeypatch):
    """Posterior-mean-gap curves across every t (uniform-noise quirk)."""
    rs = np.random.RandomState(3)
    noises = rs.rand(T, B, 3, IMG, IMG).astype(np.float32)  # t = T-1 .. 0
    it = iter(noises)
    monkeypatch.setattr(torch, "rand_like",
                        lambda x: torch.from_numpy(next(it)))
    with torch.no_grad():
        want_gap, want_ae = env["ref"].representation_learning_gap_measure(
            torch_encoder, env["t_dec"], torch.from_numpy(data["x"]))
    got_gap, got_ae = env["ours"].representation_learning_gap_measure(
        None, jax_encoder, env["decoder"], jnp.asarray(to_nhwc(data["x"])),
        noise=jnp.asarray(noises.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(got_gap), np.array(want_gap),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ae), np.array(want_ae),
                               rtol=1e-3, atol=1e-5)


def test_denoise_one_step(env, data, monkeypatch):
    rs = np.random.RandomState(4)
    noise = rs.randn(B, 3, IMG, IMG).astype(np.float32)
    monkeypatch.setattr(torch, "randn_like",
                        lambda x: torch.from_numpy(noise))
    tl = [40, 80]
    with torch.no_grad():
        want_x0, want_ae = env["ref"].representation_learning_denoise_one_step(
            torch_encoder, env["t_dec"], torch.from_numpy(data["x"]), tl)
    got_x0, got_ae = env["ours"].representation_learning_denoise_one_step(
        None, jax_encoder, env["decoder"], jnp.asarray(to_nhwc(data["x"])),
        tl, noise=jnp.asarray(to_nhwc(noise)))
    close(got_x0, want_x0, what="denoise_one_step x0")
    close(got_ae, want_ae, what="denoise_one_step ae_x0")


# --------------------------------------------------------------------- #
# training losses
# --------------------------------------------------------------------- #

def _patch_train_rng(monkeypatch, t_vals, noise):
    monkeypatch.setattr(torch, "randint",
                        lambda *a, **k: torch.from_numpy(t_vals))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x: torch.from_numpy(noise))


def test_regular_train_loss(env, data, monkeypatch):
    t_vals = np.array([13, 77], dtype=np.int64)
    noise = np.random.RandomState(6).randn(B, 3, IMG, IMG).astype(np.float32)
    _patch_train_rng(monkeypatch, t_vals, noise)
    with torch.no_grad():
        want = env["ref"].regular_train_one_batch(
            env["t_unet"], torch.from_numpy(data["x"]))
    got = env["ours"].regular_train_one_batch(
        None, env["denoise_fn"], jnp.asarray(to_nhwc(data["x"])),
        t=jnp.asarray(t_vals.astype(np.int32)),
        noise=jnp.asarray(to_nhwc(noise)))
    np.testing.assert_allclose(float(got["prediction_loss"]),
                               float(want["prediction_loss"]),
                               rtol=1e-4, atol=1e-6)


def test_representation_train_loss(env, data, monkeypatch):
    t_vals = np.array([5, 91], dtype=np.int64)
    noise = np.random.RandomState(8).randn(B, 3, IMG, IMG).astype(np.float32)
    _patch_train_rng(monkeypatch, t_vals, noise)
    with torch.no_grad():
        want = env["ref"].representation_learning_train_one_batch(
            torch_encoder, env["t_dec"], torch.from_numpy(data["x"]))
    got = env["ours"].representation_learning_train_one_batch(
        None, jax_encoder, env["decoder"], jnp.asarray(to_nhwc(data["x"])),
        t=jnp.asarray(t_vals.astype(np.int32)),
        noise=jnp.asarray(to_nhwc(noise)))
    np.testing.assert_allclose(float(got["prediction_loss"]),
                               float(want["prediction_loss"]),
                               rtol=1e-4, atol=1e-6)


def test_latent_train_loss(env, data, monkeypatch):
    t_vals = np.array([250, 888], dtype=np.int64)
    noise = np.random.RandomState(9).randn(B, LATENT_DIM).astype(np.float32)
    _patch_train_rng(monkeypatch, t_vals, noise)
    with torch.no_grad():
        want = env["ref"].latent_diffusion_train_one_batch(
            env["t_mlp"], torch_encoder, torch.from_numpy(data["x"]),
            torch.from_numpy(LAT_MEAN), torch.from_numpy(LAT_STD))
    got = env["ours"].latent_diffusion_train_one_batch(
        None, env["latent_fn"], jax_encoder, jnp.asarray(to_nhwc(data["x"])),
        jnp.asarray(LAT_MEAN), jnp.asarray(LAT_STD),
        t=jnp.asarray(t_vals.astype(np.int32)), noise=jnp.asarray(noise))
    np.testing.assert_allclose(float(got["prediction_loss"]),
                               float(want["prediction_loss"]),
                               rtol=1e-4, atol=1e-6)


def test_manipulation_train_loss(env, data):
    labels = np.array([[1, -1, 1, 0], [0, 1, -1, 1]], dtype=np.float32)
    clf_w = np.random.RandomState(10).randn(4, LATENT_DIM).astype(np.float32)
    clf_b = np.zeros(4, dtype=np.float32)

    t_clf = torch.nn.Linear(LATENT_DIM, 4)
    with torch.no_grad():
        t_clf.weight.copy_(torch.from_numpy(clf_w))
        t_clf.bias.copy_(torch.from_numpy(clf_b))
        want = env["ref"].manipulation_train_one_batch(
            t_clf, torch_encoder, torch.from_numpy(data["x"]),
            torch.from_numpy(labels), torch.from_numpy(LAT_MEAN),
            torch.from_numpy(LAT_STD))

    def j_clf(z):
        return z @ jnp.asarray(clf_w).T + jnp.asarray(clf_b)

    got = env["ours"].manipulation_train_one_batch(
        j_clf, jax_encoder, jnp.asarray(to_nhwc(data["x"])),
        jnp.asarray(labels), jnp.asarray(LAT_MEAN), jnp.asarray(LAT_STD))
    np.testing.assert_allclose(float(got["bce_loss"]),
                               float(want["bce_loss"]),
                               rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------- #
# stochastic DDPM ancestral paths (noise injected on both sides)
# --------------------------------------------------------------------- #

def _patch_step_noise(monkeypatch, noises):
    """Reference noise_p_sample draws torch.randn(shape, device) per step."""
    it = iter(noises)
    monkeypatch.setattr(torch, "randn",
                        lambda *a, **k: torch.from_numpy(next(it)))


def test_regular_ddpm_sample_trajectory(env, data, monkeypatch):
    rs = np.random.RandomState(21)
    noises = rs.randn(T, B, 3, IMG, IMG).astype(np.float32)  # t = T-1 .. 0
    _patch_step_noise(monkeypatch, noises)
    with torch.no_grad():
        want = env["ref"].regular_ddpm_sample(
            env["t_unet"], torch.from_numpy(data["xT"]))
    got = env["ours"].regular_ddpm_sample(
        None, env["denoise_fn"], jnp.asarray(to_nhwc(data["xT"])),
        noise=jnp.asarray(noises.transpose(0, 1, 3, 4, 2)))
    close(got, want, what="regular_ddpm_sample")


def test_shift_ddpm_sample_trajectory(env, data, monkeypatch):
    rs = np.random.RandomState(22)
    noises = rs.randn(T, B, 3, IMG, IMG).astype(np.float32)
    _patch_step_noise(monkeypatch, noises)
    with torch.no_grad():
        want = env["ref"].representation_learning_ddpm_sample(
            torch_encoder, env["t_dec"], torch.from_numpy(data["x"]),
            torch.from_numpy(data["xT"]))
    got = env["ours"].representation_learning_ddpm_sample(
        None, jax_encoder, env["decoder"], jnp.asarray(to_nhwc(data["x"])),
        jnp.asarray(to_nhwc(data["xT"])),
        noise=jnp.asarray(noises.transpose(0, 1, 3, 4, 2)))
    close(got, want, what="shift_ddpm_sample")


def test_regular_ddpm_sample_learn_sigma_trajectory(env, data, monkeypatch):
    """learn_sigma model: 2x output channels split into (eps, learned_range),
    variance interpolation (reference gaussian_diffusion.py:148-154,216-229)."""
    from model.unet import UNet as TorchUNet
    torch.manual_seed(17)
    tm = TorchUNet(learn_sigma=True, **UNET_CFG).eval()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    jm = UNet(learn_sigma=True,
              **{**UNET_CFG, "channel_multiplier": (1, 2),
                 "attention_resolutions": (2,)})

    rs = np.random.RandomState(23)
    noises = rs.randn(T, B, 3, IMG, IMG).astype(np.float32)
    _patch_step_noise(monkeypatch, noises)
    with torch.no_grad():
        want = env["ref"].regular_ddpm_sample(
            tm, torch.from_numpy(data["xT"]))
    got = env["ours"].regular_ddpm_sample(
        None, lambda xx, tt, cc: jm.apply({"params": params}, xx, tt, cc),
        jnp.asarray(to_nhwc(data["xT"])),
        noise=jnp.asarray(noises.transpose(0, 1, 3, 4, 2)))
    close(got, want, what="regular_ddpm_sample learn_sigma", atol=5e-3)


def test_x0_clip_p_sample_step(env, data, monkeypatch):
    """Single x_0-clipping ancestral step, with and without learned_range."""
    rs = np.random.RandomState(24)
    eps = rs.randn(B, 3, IMG, IMG).astype(np.float32)
    lr = np.tanh(rs.randn(B, 3, IMG, IMG).astype(np.float32))
    step_noise = rs.randn(B, 3, IMG, IMG).astype(np.float32)
    t_vals = np.array([37, 81], dtype=np.int64)
    monkeypatch.setattr(torch, "randn",
                        lambda *a, **k: torch.from_numpy(step_noise))
    for learned in (None, lr):
        with torch.no_grad():
            want = env["ref"].x_0_clip_p_sample(
                torch.from_numpy(data["x"]), torch.from_numpy(t_vals),
                torch.from_numpy(eps),
                None if learned is None else torch.from_numpy(learned))
        got = env["ours"].x_0_clip_p_sample(
            None, jnp.asarray(to_nhwc(data["x"])),
            jnp.asarray(t_vals.astype(np.int32)), jnp.asarray(to_nhwc(eps)),
            None if learned is None else jnp.asarray(to_nhwc(learned)),
            noise=jnp.asarray(to_nhwc(step_noise)))
        close(got, want, what=f"x_0_clip_p_sample learned={learned is not None}")


# --------------------------------------------------------------------- #
# full training-step parity: grads -> Adam update -> EMA
# --------------------------------------------------------------------- #

def test_full_train_step_parity(env, data, monkeypatch):
    """One COMPLETE optimizer step vs the reference: identical converted
    weights and injected (t, noise) on both sides, then loss.backward() +
    torch.optim.Adam.step() + the reference's EMA ``accumulate``
    (train_regular_diffusion.py:46-57,96-99,170-178) against our
    value_and_grad + optax adam + ema_update.  Catches what loss parity
    alone cannot: a gradient-layout bug in the converter mapping, an
    Adam hyperparameter/bias-correction mismatch, or an EMA formula drift.
    """
    import copy as _copy

    import jax
    import optax

    from pdae_tpu.training.state import ema_update

    lr, betas, eps, decay = 1e-3, (0.9, 0.999), 1e-8, 0.5

    # fresh torch model copy so env's shared weights stay untouched
    t_unet = _copy.deepcopy(env["t_unet"]).train()
    t_ema = _copy.deepcopy(t_unet)
    opt = torch.optim.Adam(t_unet.parameters(), lr=lr, betas=betas, eps=eps)

    t_vals = np.array([13, 77], dtype=np.int64)
    noise = np.random.RandomState(6).randn(B, 3, IMG, IMG).astype(np.float32)
    _patch_train_rng(monkeypatch, t_vals, noise)

    want = env["ref"].regular_train_one_batch(
        t_unet, torch.from_numpy(data["x"]))
    opt.zero_grad()
    want["prediction_loss"].backward()
    t_grads = {k: p.grad.detach().numpy()
               for k, p in t_unet.named_parameters()}
    opt.step()
    # reference EMA: ema.mul_(decay).add_(p, alpha=1-decay)
    with torch.no_grad():
        for k, p_ema in dict(t_ema.named_parameters()).items():
            p = dict(t_unet.named_parameters())[k]
            p_ema.data.mul_(decay).add_(p.data, alpha=1.0 - decay)

    # ours: same injected (t, noise), grads via value_and_grad
    p0 = convert_unet_state_dict(
        {k: v.numpy() for k, v in env["t_unet"].state_dict().items()})
    from pdae_tpu.models import UNet as JUNet
    jcfg = {**UNET_CFG, "channel_multiplier": (1, 2),
            "attention_resolutions": (2,)}
    j_unet = JUNet(**jcfg)

    def loss_fn(p):
        out = GaussianDiffusion(
            {"timesteps": T, "betas_type": "linear"}
        ).regular_train_one_batch(
            None, lambda x, t, c=None: j_unet.apply({"params": p}, x, t, c),
            jnp.asarray(to_nhwc(data["x"])),
            t=jnp.asarray(t_vals.astype(np.int32)),
            noise=jnp.asarray(to_nhwc(noise)))
        return out["prediction_loss"]

    loss, j_grads = jax.value_and_grad(loss_fn)(p0)
    np.testing.assert_allclose(float(loss),
                               float(want["prediction_loss"].detach()),
                               rtol=1e-4, atol=1e-6)

    # gradient parity: the converter's kernel transposes apply to grads
    # identically (gradients transform like their parameters)
    want_grads = convert_unet_state_dict(t_grads)
    flat_w = jax.tree_util.tree_leaves_with_path(want_grads)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(j_grads))
    assert len(flat_w) == len(flat_g)
    for path, wg in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), wg, rtol=1e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    # one optax adam step + EMA
    tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    upd, _ = tx.update(j_grads, tx.init(p0), p0)
    p1 = jax.tree_util.tree_map(jnp.add, p0, upd)
    ema1 = ema_update(jax.tree_util.tree_map(jnp.copy, p0), p1, decay)

    # Post-optimizer comparison uses DELTA direction + magnitude, not
    # absolute values: adam normalizes by sqrt(v̂)+eps, so for elements
    # with |grad| near the grad-parity tolerance the UPDATE can legally
    # flip by up to ±lr from sub-tolerance numeric noise.  Cosine
    # similarity + norm ratio of (p1 - p0) per leaf still catches every
    # structural failure (a converter transposition, wrong betas/eps/bias
    # correction, an EMA formula drift) while ignoring per-element
    # sign-flip noise on tiny gradients.
    flat_wg = dict(jax.tree_util.tree_leaves_with_path(want_grads))

    def delta_check(ours_tree, want_tree, what):
        flat_ours = dict(jax.tree_util.tree_leaves_with_path(ours_tree))
        flat_p0 = dict(jax.tree_util.tree_leaves_with_path(p0))
        checked = 0
        for path, want in jax.tree_util.tree_leaves_with_path(want_tree):
            if float(np.max(np.abs(flat_wg[path]))) < 1e-6:
                # mathematically-zero gradient (e.g. a conv bias whose
                # output feeds a GroupNorm): each side's adam update is
                # lr*sign(float noise) -- no direction to compare
                continue
            da = (np.asarray(flat_ours[path]) -
                  np.asarray(flat_p0[path])).ravel().astype(np.float64)
            db = (np.asarray(want) -
                  np.asarray(flat_p0[path])).ravel().astype(np.float64)
            na, nb = np.linalg.norm(da), np.linalg.norm(db)
            if nb < 1e-12:
                assert na < 1e-12, (what, jax.tree_util.keystr(path))
                continue
            cos = float(da @ db / (na * nb))
            assert cos > 0.98, (what, jax.tree_util.keystr(path), cos)
            assert 0.9 < na / nb < 1.1, (what, jax.tree_util.keystr(path),
                                         na / nb)
            checked += 1
        assert checked > 50, (what, checked)   # the check must have teeth

    want_p1 = convert_unet_state_dict(
        {k: v.numpy() for k, v in t_unet.state_dict().items()})
    want_ema1 = convert_unet_state_dict(
        {k: v.numpy() for k, v in t_ema.state_dict().items()})
    delta_check(p1, want_p1, "post-adam")
    delta_check(ema1, want_ema1, "post-EMA")


def test_representation_grads_respect_freeze(env, data, monkeypatch):
    """PDAE-stage gradient parity with the reference's freeze semantics:
    torch side calls ShiftUNet.freeze() (shift_unet.py:299-310) and
    backprops -- only the 4 trainable parts get grads; our side takes
    grads over the split shift subtree with the trunk merged frozen
    (training/partition.py).  The two gradient sets must match leaf for
    leaf."""
    import copy as _copy

    import jax

    from pdae_tpu.training.partition import merge_params, split_shift_unet

    t_dec = _copy.deepcopy(env["t_dec"])
    t_dec.freeze()

    t_vals = np.array([5, 91], dtype=np.int64)
    noise = np.random.RandomState(8).randn(B, 3, IMG, IMG).astype(np.float32)
    _patch_train_rng(monkeypatch, t_vals, noise)

    want = env["ref"].representation_learning_train_one_batch(
        torch_encoder, t_dec, torch.from_numpy(data["x"]))
    want["prediction_loss"].backward()
    frozen_with_grad = [k for k, p in t_dec.named_parameters()
                        if not p.requires_grad and p.grad is not None]
    assert not frozen_with_grad
    t_grads = {k: (p.grad.detach().numpy() if p.grad is not None
                   else np.zeros_like(p.detach().numpy()))
               for k, p in t_dec.named_parameters()}

    p_dec = convert_unet_state_dict(
        {k: v.numpy() for k, v in env["t_dec"].state_dict().items()})
    shift0, frozen0 = split_shift_unet(p_dec)

    from pdae_tpu.models import ShiftUNet as JShift
    jcfg = {**UNET_CFG, "channel_multiplier": (1, 2),
            "attention_resolutions": (2,)}
    j_dec = JShift(latent_dim=LATENT_DIM, **jcfg)

    def loss_fn(shift):
        out = GaussianDiffusion(
            {"timesteps": T, "betas_type": "linear"}
        ).representation_learning_train_one_batch(
            None, jax_encoder,
            lambda x, t, z: j_dec.apply(
                {"params": merge_params(frozen0, shift)}, x, t, z),
            jnp.asarray(to_nhwc(data["x"])),
            t=jnp.asarray(t_vals.astype(np.int32)),
            noise=jnp.asarray(to_nhwc(noise)))
        return out["prediction_loss"]

    loss, j_grads = jax.value_and_grad(loss_fn)(shift0)
    np.testing.assert_allclose(float(loss),
                               float(want["prediction_loss"].detach()),
                               rtol=1e-4, atol=1e-6)

    want_shift_grads, want_frozen_grads = split_shift_unet(
        convert_unet_state_dict(t_grads))
    # reference's freeze left the trunk grad-free (all zeros after fill)
    assert all(not np.any(l) for l in
               jax.tree_util.tree_leaves(want_frozen_grads))
    flat_g = dict(jax.tree_util.tree_leaves_with_path(j_grads))
    flat_w = jax.tree_util.tree_leaves_with_path(want_shift_grads)
    assert len(flat_w) == len(flat_g)
    for path, wg in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), wg, rtol=1e-3, atol=2e-5,
            err_msg=f"shift grad mismatch at {jax.tree_util.keystr(path)}")


def test_cosine_betas_ddim_trajectory(env, data):
    """Cosine schedule end-to-end: constants are golden-tested
    (test_schedules.py), and here the full DDIM re-spacing + sampling loop
    runs on a cosine-built GaussianDiffusion against the reference
    (gaussian_diffusion.py:17-27's cosine branch)."""
    from diffusion.gaussian_diffusion import GaussianDiffusion as RefGD

    cfg = {"timesteps": T, "betas_type": "cosine"}
    ref = RefGD(cfg, torch.device("cpu"))
    ours = GaussianDiffusion(cfg)
    xT_t = torch.from_numpy(data["xT"])
    with torch.no_grad():
        want = ref.ddim_sample("ddim10", env["t_unet"], xT_t)
    got = ours.ddim_sample("ddim10", env["denoise_fn"],
                           jnp.asarray(to_nhwc(data["xT"])))
    close(got, want, what="cosine ddim_sample ddim10")

    with torch.no_grad():
        want_e = ref.ddim_encode("ddim10", env["t_unet"],
                                 torch.from_numpy(data["x"]))
    got_e = ours.ddim_encode("ddim10", env["denoise_fn"],
                             jnp.asarray(to_nhwc(data["x"])))
    close(got_e, want_e, what="cosine ddim_encode ddim10")
