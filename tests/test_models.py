"""Shape, init, and structural tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.models import (LinearClassifier, MLPSkipNet, SemanticEncoder,
                             ShiftUNet, UNet, build_decoder, build_denoise_fn,
                             build_encoder, build_latent_denoise_fn,
                             encoder_for_resolution, timestep_embedding)

pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)

MNIST_UNET = dict(
    input_channel=1, base_channel=64, channel_multiplier=(1, 2, 2, 4),
    num_residual_blocks_of_a_block=2, attention_resolutions=(),
    num_heads=1, head_channel=-1, use_new_attention_order=False, dropout=0.0)

SMALL_UNET = dict(
    input_channel=3, base_channel=32, channel_multiplier=(1, 2),
    num_residual_blocks_of_a_block=1, attention_resolutions=(2,),
    num_heads=2, head_channel=-1, use_new_attention_order=False, dropout=0.0)


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_timestep_embedding_matches_closed_form():
    t = jnp.array([0, 1, 500], jnp.int32)
    emb = np.asarray(timestep_embedding(t, 8))
    assert emb.shape == (3, 8)
    freqs = np.exp(-np.log(10000) * np.arange(4) / 4)
    want = np.concatenate([np.cos(np.outer([0, 1, 500], freqs)),
                           np.sin(np.outer([0, 1, 500], freqs))], axis=1)
    np.testing.assert_allclose(emb, want, rtol=1e-4, atol=1e-4)


def test_unet_output_shape_and_zero_init():
    model = UNet(**SMALL_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.array([3, 500], jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    # zero-init final conv => output is exactly zero at init
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_learn_sigma_doubles_channels():
    model = UNet(learn_sigma=True, **SMALL_UNET)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == (1, 16, 16, 6)


def test_unet_class_conditional():
    model = UNet(num_class=10, **SMALL_UNET)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    c = jnp.array([1, 7], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, c)
    out = model.apply(params, x, t, c)
    assert out.shape == x.shape
    assert "label_emb" in params["params"]


def test_shift_unet_shapes_and_trunk_tree_compat():
    su = ShiftUNet(latent_dim=16, **SMALL_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    t = jnp.array([1, 99], jnp.int32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    sp = su.init(jax.random.PRNGKey(2), x, t, z)
    eps, grad = su.apply(sp, x, t, z)
    assert eps.shape == x.shape and grad.shape == x.shape
    # zero-init heads => both outputs zero at init
    np.testing.assert_array_equal(np.asarray(eps), 0.0)
    np.testing.assert_array_equal(np.asarray(grad), 0.0)

    # the frozen trunk of ShiftUNet has the SAME param tree as a plain UNet
    # (this is what makes pre-trained DPM checkpoint loading a pytree merge)
    un = UNet(**SMALL_UNET)
    up = un.init(jax.random.PRNGKey(3), x, t)
    unet_keys = set(up["params"].keys())
    shift_keys = set(sp["params"].keys())
    assert unet_keys <= shift_keys
    extra = shift_keys - unet_keys
    assert all(k.startswith(("label_emb", "shift_")) for k in extra), extra
    # matching subtree shapes
    for k in unet_keys:
        a_shapes = jax.tree_util.tree_map(jnp.shape, up["params"][k])
        b_shapes = jax.tree_util.tree_map(jnp.shape, sp["params"][k])
        assert a_shapes == b_shapes, k


def test_shift_unet_gradient_depends_on_z():
    su = ShiftUNet(latent_dim=16, **SMALL_UNET)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    t = jnp.array([10], jnp.int32)
    sp = su.init(jax.random.PRNGKey(2), x, t, jnp.zeros((1, 16)))
    # perturb shift_out_conv away from zero so gradient is non-trivial
    sp = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim == 4 else a, sp)
    z1 = jnp.zeros((1, 16))
    z2 = jnp.ones((1, 16))
    _, g1 = su.apply(sp, x, t, z1)
    eps1, _ = su.apply(sp, x, t, z1)
    eps2, g2 = su.apply(sp, x, t, z2)
    assert float(jnp.max(jnp.abs(g1 - g2))) > 1e-6  # gradient sees z
    np.testing.assert_allclose(np.asarray(eps1), np.asarray(eps2),
                               atol=1e-6)  # epsilon path ignores z


def test_mlp_skip_net_shapes():
    m = MLPSkipNet(input_channel=32, model_channel=64, num_layers=4,
                   time_emb_channel=8, use_norm=True, dropout=0.0)
    z = jax.random.normal(jax.random.PRNGKey(0), (5, 32))
    t = jnp.array([0, 1, 2, 3, 999], jnp.int32)
    p = m.init(jax.random.PRNGKey(1), z, t)
    out = m.apply(p, z, t)
    assert out.shape == (5, 32)
    # layers_1..layers_{n-2} consume model_channel + input skip
    k = p["params"]["layers_1"]["linear"]["kernel"]
    assert k.shape == (64 + 32, 64)
    k_last = p["params"]["layers_3"]["linear"]["kernel"]
    assert k_last.shape == (64 + 32, 32)
    assert "linear_emb" not in p["params"]["layers_3"]


def test_encoders_output_latent():
    for size in (64, 128):
        enc = encoder_for_resolution(size, 512)
        x = jnp.zeros((2, size, size, 3))
        p = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(p, x)
        assert z.shape == (2, 512)
        # final dense input is 4*4*final_ch
        final_ch = enc.channels[-1]
        assert p["params"]["final_dense"]["kernel"].shape == (16 * final_ch, 512)


def test_classifier():
    clf = LinearClassifier(num_classes=40)
    z = jnp.zeros((3, 512))
    p = clf.init(jax.random.PRNGKey(0), z)
    out = clf.apply(p, z)
    assert out.shape == (3, 40)
    assert LinearClassifier.weight(p).shape == (40, 512)


def test_registry_factories():
    dn = build_denoise_fn({"model": "MNISTDenoiseFn", **MNIST_UNET})
    assert isinstance(dn, UNet) and dn.base_channel == 64
    dec = build_decoder({"model": "CELEBA64Decoder", "latent_dim": 512},
                        SMALL_UNET)
    assert isinstance(dec, ShiftUNet) and dec.latent_dim == 512
    enc = build_encoder({"model": "CELEBA64Encoder", "latent_dim": 512})
    assert enc.channels == (64, 128, 128, 128)
    enc128 = build_encoder({"model": "FFHQEncoder", "latent_dim": 512})
    assert enc128.channels == (64, 128, 256, 256, 256)
    lat = build_latent_denoise_fn({"model": "CELEBA64LatentDenoiseFn",
                                   "input_channel": 512})
    assert isinstance(lat, MLPSkipNet)


@pytest.mark.parametrize("new_order", [False, True])
def test_attention_orders_both_run(new_order):
    cfg = dict(SMALL_UNET)
    cfg["use_new_attention_order"] = new_order
    model = UNet(**cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    p = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(p, x, t)
    assert out.shape == x.shape


def test_param_count_parity_with_reference_torch():
    """Total parameter-count parity with the torch reference for the MNIST
    config (strong structural check; reference executed, never copied)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        from model.unet import UNet as TorchUNet
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    tm = TorchUNet(**{**MNIST_UNET,
                      "channel_multiplier": [1, 2, 2, 4],
                      "attention_resolutions": []})
    torch_count = sum(p.numel() for p in tm.parameters())

    jm = UNet(**MNIST_UNET)
    x = jnp.zeros((1, 32, 32, 1))
    t = jnp.zeros((1,), jnp.int32)
    params = jm.init(jax.random.PRNGKey(0), x, t)
    assert n_params(params) == torch_count
