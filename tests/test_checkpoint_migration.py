"""End-to-end user-migration path: reference torch ``.pt`` checkpoints ->
``scripts/convert_torch_checkpoint.py`` CLI -> our sampler context ->
numerically identical samples.

This is the workflow a reference user follows to switch frameworks with
their downloaded artifacts (reference README.md:45-51: pre-trained DPMs
with 'ema_denoise_fn', trained PDAE autoencoders with
'ema_encoder'/'ema_decoder').  Unlike test_torch_convert.py (in-memory
state dicts), this drives the CLI + file formats + SamplerContext loading.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax.numpy as jnp

from pdae_tpu.diffusion import GaussianDiffusion
from pdae_tpu.sampling.context import SamplerContext
from pdae_tpu.utils import save_yaml

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

UNET_CFG = dict(
    input_channel=3, base_channel=32, channel_multiplier=[1, 2],
    num_residual_blocks_of_a_block=1, attention_resolutions=[2],
    num_heads=2, head_channel=-1, use_new_attention_order=False, dropout=0.0)
LATENT_DIM = 16
T = 50


def convert_cli(argv):
    spec = importlib.util.spec_from_file_location(
        "convert_cli", os.path.join(REPO, "scripts",
                                    "convert_torch_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(argv)


def to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def test_pretrained_dpm_migration(tmp_path):
    """DPM checkpoint: .pt -> CLI -> SamplerContext.build_denoise ->
    ddim_sample matches the torch reference on the same x_T."""
    from model.unet import UNet as TorchUNet
    from diffusion.gaussian_diffusion import GaussianDiffusion as RefGD

    torch.manual_seed(11)
    tm = TorchUNet(**UNET_CFG).eval()
    pt = str(tmp_path / "dpm.pt")
    torch.save({"step": 500000,
                "denoise_fn": tm.state_dict(),
                "ema_denoise_fn": tm.state_dict(),
                "optimizer": {"not": "portable"}}, pt)

    ckpt = str(tmp_path / "dpm.ckpt")
    convert_cli([pt, ckpt])

    dpm_cfg = str(tmp_path / "dpm_config.yml")
    save_yaml({"denoise_fn_config": {"model": "UNet", **UNET_CFG},
               "diffusion_config": {"timesteps": T, "betas_type": "linear"}},
              dpm_cfg)

    ctx = SamplerContext({
        "diffusion_config": {"timesteps": T, "betas_type": "linear"},
        "config_path": dpm_cfg, "checkpoint_path": ckpt,
        "image_size": 16, "image_channel": 3})
    ctx.build_denoise()

    rs = np.random.RandomState(0)
    x_T = rs.randn(2, 3, 16, 16).astype(np.float32)
    ref_gd = RefGD({"timesteps": T, "betas_type": "linear"},
                   torch.device("cpu"))
    with torch.no_grad():
        want = ref_gd.ddim_sample("ddim5", tm, torch.from_numpy(x_T))
    got = ctx.gd.ddim_sample(
        "ddim5", lambda xx, tt, cc=None: ctx.denoise_apply(
            ctx.dn_params, xx, tt, cc),
        jnp.asarray(to_nhwc(x_T)))
    np.testing.assert_allclose(np.asarray(got),
                               to_nhwc(want.detach().numpy()),
                               rtol=1e-3, atol=2e-3)


def test_pdae_autoencoder_migration(tmp_path):
    """PDAE checkpoint (ema_encoder + ema_decoder): .pt -> CLI (4-stage
    encoder geometry) -> build_pdae -> autoencoding trajectory matches."""
    from model.representation_learning.encoder.celeba64 import CELEBA64Encoder
    from model.shift_unet import ShiftUNet as TorchShiftUNet
    from diffusion.gaussian_diffusion import GaussianDiffusion as RefGD

    torch.manual_seed(12)
    t_enc = CELEBA64Encoder(latent_dim=LATENT_DIM).eval()
    t_dec = TorchShiftUNet(latent_dim=LATENT_DIM, **UNET_CFG).eval()
    pt = str(tmp_path / "pdae.pt")
    torch.save({"step": 250000,
                "encoder": t_enc.state_dict(),
                "ema_encoder": t_enc.state_dict(),
                "decoder": t_dec.state_dict(),
                "ema_decoder": t_dec.state_dict()}, pt)

    ckpt = str(tmp_path / "pdae.ckpt")
    convert_cli([pt, ckpt, "--encoder-stages", "4"])

    dpm_cfg = str(tmp_path / "dpm_config.yml")
    save_yaml({"denoise_fn_config": {"model": "UNet", **UNET_CFG},
               "diffusion_config": {"timesteps": T, "betas_type": "linear"}},
              dpm_cfg)
    pdae_cfg = str(tmp_path / "pdae_config.yml")
    save_yaml({
        "train_dataset_config": {"name": "SYNTHETIC", "image_size": 64,
                                 "image_channel": 3},
        "diffusion_config": {"timesteps": T, "betas_type": "linear"},
        "trained_ddpm_config": dpm_cfg,
        "encoder_config": {"model": "CELEBA64Encoder",
                           "latent_dim": LATENT_DIM},
        "decoder_config": {"model": "CELEBA64Decoder",
                           "latent_dim": LATENT_DIM},
    }, pdae_cfg)

    ctx = SamplerContext({"config_path": pdae_cfg, "checkpoint_path": ckpt})
    ctx.build_pdae()

    rs = np.random.RandomState(1)
    x_0 = np.clip(rs.randn(1, 3, 64, 64), -1, 1).astype(np.float32)
    ref_gd = RefGD({"timesteps": T, "betas_type": "linear"},
                   torch.device("cpu"))
    with torch.no_grad():
        want = ref_gd.representation_learning_autoencoding(
            "ddim4", "ddim3", t_enc, t_dec, torch.from_numpy(x_0))
    got = ctx.gd.representation_learning_autoencoding(
        "ddim4", "ddim3", ctx.encoder(), ctx.decoder(),
        jnp.asarray(to_nhwc(x_0)))
    np.testing.assert_allclose(np.asarray(got),
                               to_nhwc(want.detach().numpy()),
                               rtol=1e-3, atol=2e-3)


def test_latents_stats_migration(tmp_path):
    """Inferred-latents stats file (reference infer_latents output)."""
    pt = str(tmp_path / "celeba64.pt")
    mean = np.random.RandomState(2).randn(LATENT_DIM).astype(np.float32)
    std = (0.5 + np.random.RandomState(3).rand(LATENT_DIM)).astype(np.float32)
    torch.save({"mean": torch.from_numpy(mean),
                "std": torch.from_numpy(std)}, pt)
    ckpt = str(tmp_path / "latents.ckpt")
    convert_cli([pt, ckpt, "--stats"])

    ctx = SamplerContext({"inferred_latents_path": ckpt})
    m, s = ctx.latent_stats()
    np.testing.assert_allclose(np.asarray(m), mean)
    np.testing.assert_allclose(np.asarray(s), std)
