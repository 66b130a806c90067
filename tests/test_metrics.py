"""Tests for SSIM / MSE / FID / LPIPS machinery."""

import numpy as np
import jax.numpy as jnp
import pytest

from pdae_tpu.metrics import (FIDMetric, MSEMetric, SSIMMetric,
                              activation_statistics, frechet_distance,
                              lpips_distance, mse, ssim)


def test_ssim_identical_is_one():
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    v = float(ssim(jnp.asarray(x), jnp.asarray(x)))
    assert abs(v - 1.0) < 1e-5


def test_ssim_decreases_with_noise():
    rs = np.random.RandomState(1)
    x = rs.rand(2, 32, 32, 3).astype(np.float32)
    small = np.clip(x + 0.01 * rs.randn(*x.shape).astype(np.float32), 0, 1)
    big = np.clip(x + 0.2 * rs.randn(*x.shape).astype(np.float32), 0, 1)
    v_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    v_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert 1.0 > v_small > v_big > 0.0


def test_ssim_matches_naive_gaussian_impl():
    """Independent numpy implementation of the same formula."""
    from scipy.ndimage import convolve
    rs = np.random.RandomState(2)
    x = rs.rand(1, 24, 24, 1).astype(np.float64)
    y = np.clip(x + 0.05 * rs.randn(*x.shape), 0, 1)

    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    w = np.outer(g, g)

    x2d, y2d = x[0, :, :, 0], y[0, :, :, 0]

    def blur(a):
        return convolve(a, w, mode="constant")

    mu1, mu2 = blur(x2d), blur(y2d)
    s1 = blur(x2d ** 2) - mu1 ** 2
    s2 = blur(y2d ** 2) - mu2 ** 2
    s12 = blur(x2d * y2d) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    # compare interior (border handling differs: SAME zero-pad vs constant)
    ours = np.asarray(ssim(jnp.asarray(x, jnp.float32),
                           jnp.asarray(y, jnp.float32),
                           size_average=False))
    inner = smap[5:-5, 5:-5].mean()
    # means over full map with same padding should be close
    assert abs(float(ours[0]) - smap.mean()) < 5e-3, (ours, smap.mean(), inner)


def test_mse_metric():
    a = np.zeros((2, 4, 4, 1))
    b = np.ones((2, 4, 4, 1)) * 0.5
    m = MSEMetric()
    m.process(a, b)
    m.all_gather_results()
    assert abs(m.compute_metrics() - 0.25) < 1e-12


def test_frechet_distance_identities():
    mu = np.array([1.0, 2.0])
    sigma = np.array([[1.0, 0.2], [0.2, 2.0]])
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    # diagonal closed form: |mu1-mu2|^2 + sum (sqrt(s1)-sqrt(s2))^2
    mu2 = np.array([0.0, 0.0])
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 16.0])
    want = 5.0 + ((1 - 3) ** 2 + (2 - 4) ** 2)
    got = frechet_distance(mu, s1, mu2, s2)
    assert abs(got - want) < 1e-6


def test_fid_metric_with_toy_features():
    rs = np.random.RandomState(0)

    def feat(images):
        flat = images.reshape(images.shape[0], -1).astype(np.float64)
        return flat[:, :8]

    real = rs.rand(300, 4, 4, 2)
    fake_same = rs.rand(300, 4, 4, 2)
    fake_shifted = np.clip(fake_same + 0.5, 0, 1)

    m = FIDMetric(feat)
    m.set_target_from_images(real)
    m.process(fake_same)
    m.all_gather_results()
    fid_same = m.compute_metrics()

    m2 = FIDMetric(feat, m.target_mu, m.target_sigma)
    m2.process(fake_shifted)
    m2.all_gather_results()
    fid_shift = m2.compute_metrics()
    assert fid_shift > fid_same >= 0.0


def test_lpips_zero_for_identical_random_weights():
    rs = np.random.RandomState(0)
    params = {}
    in_ch = 3
    from pdae_tpu.metrics.lpips import _ALEX, _CHANNELS
    for i, (out, k, s, p) in enumerate(_ALEX):
        params[f"conv{i}_w"] = jnp.asarray(
            rs.randn(k, k, in_ch, out).astype(np.float32) * 0.05)
        params[f"conv{i}_b"] = jnp.zeros((out,), jnp.float32)
        in_ch = out
    for i, c in enumerate(_CHANNELS):
        params[f"lin{i}_w"] = jnp.asarray(
            np.abs(rs.randn(c)).astype(np.float32))
    x = jnp.asarray(rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_same = np.asarray(lpips_distance(params, x, x))
    d_diff = np.asarray(lpips_distance(params, x, y))
    assert np.all(d_same < 1e-6)
    assert np.all(d_diff > 1e-4)


def test_lpips_converter_formats():
    from pdae_tpu.utils.torch_convert import convert_lpips_state_dict
    from pdae_tpu.metrics.lpips import _ALEX, _CHANNELS
    # lpips-package style keys
    sd = {}
    conv_idx = {0: "net.slice1.0", 1: "net.slice2.3", 2: "net.slice3.6",
                3: "net.slice4.8", 4: "net.slice5.10"}
    in_ch = 3
    for i, (out, k, s, p) in enumerate(_ALEX):
        sd[f"{conv_idx[i]}.weight"] = np.zeros((out, in_ch, k, k), np.float32)
        sd[f"{conv_idx[i]}.bias"] = np.zeros((out,), np.float32)
        in_ch = out
    for i, c in enumerate(_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = np.ones((1, c, 1, 1), np.float32)
    sd["scaling_layer.shift"] = np.zeros((1, 3, 1, 1), np.float32)
    out = convert_lpips_state_dict(sd)
    assert out["conv0_w"].shape == (11, 11, 3, 64)
    assert out["lin4_w"].shape == (256,)
    assert "scaling_layer.shift" not in out
    # raw torchvision alexnet style
    sd2 = {"features.0.weight": np.zeros((64, 3, 11, 11), np.float32),
           "features.0.bias": np.zeros((64,), np.float32)}
    out2 = convert_lpips_state_dict(sd2)
    assert out2["conv0_w"].shape == (11, 11, 3, 64)
