"""Numerical parity: torch reference models vs converted flax models.

Builds the torch reference UNet/ShiftUNet/encoder/MLPSkipNet with random
weights, converts the state dict, and compares forward outputs on the same
inputs (NCHW<->NHWC at the boundary).  This validates both the converter
and the architectural parity of our reimplementation.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from pdae_tpu.models import MLPSkipNet, SemanticEncoder, ShiftUNet, UNet
from pdae_tpu.utils.torch_convert import (convert_encoder_state_dict,
                                          convert_mlp_skip_net_state_dict,
                                          convert_unet_state_dict)

UNET_CFG = dict(
    input_channel=3, base_channel=32, channel_multiplier=[1, 2],
    num_residual_blocks_of_a_block=2, attention_resolutions=[2],
    num_heads=2, head_channel=-1, use_new_attention_order=False, dropout=0.0)


def to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


@pytest.mark.parametrize("new_order", [False, True])
def test_unet_forward_parity(new_order):
    from model.unet import UNet as TorchUNet
    cfg = {**UNET_CFG, "use_new_attention_order": new_order}
    tm = TorchUNet(**cfg).eval()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})

    jm = UNet(**{**cfg, "channel_multiplier": (1, 2),
                 "attention_resolutions": (2,)})
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([3, 777])
    with torch.no_grad():
        want = tm(x, t).numpy()
    got = jm.apply({"params": params}, jnp.asarray(to_nhwc(x.numpy())),
                   jnp.asarray(t.numpy().astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=2e-4, atol=2e-5)


def test_shift_unet_forward_parity():
    from model.shift_unet import ShiftUNet as TorchShiftUNet
    tm = TorchShiftUNet(latent_dim=16, **UNET_CFG).eval()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})

    jm = ShiftUNet(latent_dim=16,
                   **{**UNET_CFG, "channel_multiplier": (1, 2),
                      "attention_resolutions": (2,)})
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([10, 500])
    z = torch.randn(2, 16)
    with torch.no_grad():
        want_eps, want_grad = tm(x, t, z)
    got_eps, got_grad = jm.apply(
        {"params": params}, jnp.asarray(to_nhwc(x.numpy())),
        jnp.asarray(t.numpy().astype(np.int32)), jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(got_eps), to_nhwc(want_eps.numpy()),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_grad),
                               to_nhwc(want_grad.numpy()),
                               rtol=2e-4, atol=2e-5)


def test_encoder_forward_parity_64px():
    from model.representation_learning.encoder.celeba64 import CELEBA64Encoder
    tm = CELEBA64Encoder(latent_dim=512).eval()
    params = convert_encoder_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, num_stages=4)
    jm = SemanticEncoder(512, channels=(64, 128, 128, 128),
                         attn_after_stage=2)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = tm(x).numpy()
    got = jm.apply({"params": params}, jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_encoder_forward_parity_128px():
    from model.representation_learning.encoder.ffhq import FFHQEncoder
    tm = FFHQEncoder(latent_dim=512).eval()
    params = convert_encoder_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}, num_stages=5)
    jm = SemanticEncoder(512, channels=(64, 128, 256, 256, 256),
                         attn_after_stage=3)
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        want = tm(x).numpy()
    got = jm.apply({"params": params}, jnp.asarray(to_nhwc(x.numpy())))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_norm", [True, False])
def test_mlp_skip_net_forward_parity(use_norm):
    from model.mlp_skip_net import MLPSkipNet as TorchMLP
    tm = TorchMLP(input_channel=32, model_channel=64, num_layers=4,
                  time_emb_channel=16, use_norm=use_norm, dropout=0.0).eval()
    params = convert_mlp_skip_net_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    jm = MLPSkipNet(input_channel=32, model_channel=64, num_layers=4,
                    time_emb_channel=16, use_norm=use_norm, dropout=0.0)
    z = torch.randn(3, 32)
    t = torch.tensor([0, 400, 999])
    with torch.no_grad():
        want = tm(z, t).numpy()
    got = jm.apply({"params": params}, jnp.asarray(z.numpy()),
                   jnp.asarray(t.numpy().astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("new_order", [False, True])
def test_unet_forward_parity_head_channel(new_order):
    """head_channel > 0 (ADM-style fixed channels per head, heads =
    channels // head_channel): the configuration the downloadable
    pre-trained DPM configs can select (reference model/unet.py:24,84) --
    no shipped YAML uses it, so it needs its own parity coverage."""
    from model.unet import UNet as TorchUNet
    cfg = {**UNET_CFG, "num_heads": 1, "head_channel": 16,
           "use_new_attention_order": new_order}
    tm = TorchUNet(**cfg).eval()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})

    jm = UNet(**{**cfg, "channel_multiplier": (1, 2),
                 "attention_resolutions": (2,)})
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([3, 777])
    with torch.no_grad():
        want = tm(x, t).numpy()
    got = jm.apply({"params": params}, jnp.asarray(to_nhwc(x.numpy())),
                   jnp.asarray(t.numpy().astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=2e-4, atol=2e-5)


def test_unet_forward_parity_class_conditional():
    """num_class set (MNIST config path): the label embedding is ADDED to
    the time embedding (reference model/unet.py:57-58,190-192); converted
    embedding tables must line up."""
    from model.unet import UNet as TorchUNet
    cfg = {**UNET_CFG, "num_class": 10}
    tm = TorchUNet(**cfg).eval()
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})

    jm = UNet(**{**cfg, "channel_multiplier": (1, 2),
                 "attention_resolutions": (2,)})
    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([3, 777])
    c = torch.tensor([7, 0])
    with torch.no_grad():
        want = tm(x, t, c).numpy()
    got = jm.apply({"params": params}, jnp.asarray(to_nhwc(x.numpy())),
                   jnp.asarray(t.numpy().astype(np.int32)),
                   jnp.asarray(c.numpy().astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want),
                               rtol=2e-4, atol=2e-5)
