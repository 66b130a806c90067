"""Exercise every sampler in the suite against a tiny trained stack."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.models.encoder import SemanticEncoder
from pdae_tpu.sampling import SAMPLERS
from pdae_tpu.training import (ManipulationTrainer, RegularDiffusionTrainer,
                               RepresentationLearningTrainer)
from pdae_tpu.utils import save_checkpoint

DDPM_MODEL = {
    "model": "UNet", "input_channel": 1, "base_channel": 8,
    "channel_multiplier": [1, 2], "num_residual_blocks_of_a_block": 1,
    "attention_resolutions": [], "num_heads": 1, "head_channel": -1,
    "use_new_attention_order": False, "dropout": 0.0,
}
DS = {"name": "SYNTHETIC", "image_size": 16, "image_channel": 1,
      "length": 24}
RUNNER = {"display_steps": 100, "evaluate_every_steps": 10**6,
          "save_latest_every_steps": 10**6,
          "save_checkpoint_every_steps": 10**6, "num_iterations": 1,
          "ema_every": 1, "ema_decay": 0.9, "compile": False}
OPT = {"lr": 1e-3, "adam_betas": "(0.9, 0.999)", "adam_eps": 1e-8,
       "weight_decay": 0.0}
DIFFUSION = {"timesteps": 20, "betas_type": "linear"}
DL = {"train": {"num_workers": 1, "batch_size": 8},
      "eval": {"num_generations": 2}}


def _tiny_encoder(config, image_size=None, dtype=jnp.float32):
    return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                           attn_after_stage=2, dtype=dtype)


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    """Train all stages for 1 step; return paths + configs."""
    import pdae_tpu.training.representation as rep
    import pdae_tpu.training.manipulation as man
    import pdae_tpu.sampling.context as ctx_mod

    orig_rep, orig_man = rep.build_encoder, man.build_encoder
    orig_ctx = ctx_mod.build_encoder
    rep.build_encoder = _tiny_encoder
    man.build_encoder = _tiny_encoder
    ctx_mod.build_encoder = _tiny_encoder

    root = tmp_path_factory.mktemp("stack")
    ddpm_cfg = {
        "train_dataset_config": DS, "eval_dataset_config": {},
        "diffusion_config": DIFFUSION, "denoise_fn_config": DDPM_MODEL,
        "dataloader_config": DL, "optimizer_config": OPT,
        "runner_config": RUNNER,
    }
    dpm_run = str(root / "dpm")
    RegularDiffusionTrainer(config=ddpm_cfg, run_path=dpm_run).train(
        max_steps=1)

    pdae_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 8},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_ddpm_checkpoint": os.path.join(dpm_run, "checkpoints",
                                                "latest.ckpt"),
        "encoder_config": {"model": "TINY", "latent_dim": 8},
        "decoder_config": {"model": "ShiftUNet", "latent_dim": 8},
        "dataloader_config": DL, "optimizer_config": OPT,
        "runner_config": RUNNER,
    }
    pdae_run = str(root / "pdae")
    RepresentationLearningTrainer(config=pdae_cfg, run_path=pdae_run).train(
        max_steps=1)
    pdae_ckpt = os.path.join(pdae_run, "checkpoints", "latest.ckpt")

    save_checkpoint(str(root / "latents.ckpt"),
                    {"mean": np.zeros(8, np.float32),
                     "std": np.ones(8, np.float32)})

    latent_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 8},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": pdae_cfg,
        "trained_representation_learning_checkpoint": pdae_ckpt,
        "inferred_latents": str(root / "latents.ckpt"),
        "latent_denoise_fn_config": {
            "model": "MLPSkipNet", "input_channel": 8, "model_channel": 16,
            "num_layers": 3, "time_emb_channel": 8, "use_norm": True,
            "dropout": 0.0},
        "dataloader_config": DL,
        "optimizer_config": {**OPT, "name": "AdamW", "weight_decay": 0.01},
        "runner_config": RUNNER,
    }
    from pdae_tpu.training import LatentDiffusionTrainer
    import pdae_tpu.training.latent as lat
    orig_lat = lat.build_encoder
    lat.build_encoder = _tiny_encoder
    lat_run = str(root / "latent")
    LatentDiffusionTrainer(config=latent_cfg, run_path=lat_run).train(
        max_steps=1)

    manip_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 8, "multilabel": 5},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": pdae_cfg,
        "trained_representation_learning_checkpoint": pdae_ckpt,
        "inferred_latents": str(root / "latents.ckpt"),
        "num_classes": 5,
        "dataloader_config": DL, "optimizer_config": OPT,
        "runner_config": RUNNER,
    }
    manip_run = str(root / "manip")
    ManipulationTrainer(config=manip_cfg, run_path=manip_run).train(
        max_steps=1)

    yield {
        "root": root,
        "dpm_run": dpm_run,
        "ddpm_cfg": ddpm_cfg,
        "pdae_cfg": pdae_cfg,
        "pdae_ckpt": pdae_ckpt,
        "latent_cfg": latent_cfg,
        "lat_ckpt": os.path.join(lat_run, "checkpoints", "latest.ckpt"),
        "manip_ckpt": os.path.join(manip_run, "checkpoints", "latest.ckpt"),
        "latents": str(root / "latents.ckpt"),
    }
    rep.build_encoder = orig_rep
    man.build_encoder = orig_man
    lat.build_encoder = orig_lat
    ctx_mod.build_encoder = orig_ctx


def _pdae_sampler_config(stack, **extra):
    return {
        "config_path": stack["pdae_cfg"],
        "checkpoint_path": stack["pdae_ckpt"],
        "trained_ddpm_config_path": {"denoise_fn_config": DDPM_MODEL},
        "dataset_config": dict(DS),
        **extra,
    }


def test_test_dpms(stack, tmp_path):
    cfg = {
        "diffusion_config": DIFFUSION,
        "config_path": {"denoise_fn_config": DDPM_MODEL},
        "checkpoint_path": os.path.join(stack["dpm_run"], "checkpoints",
                                        "latest.ckpt"),
        "image_channel": 1, "image_size": 16, "num_samples": 4,
        "ddim_style": "ddim5",
        "output_path": str(tmp_path / "test_dpms.png"),
    }
    out = SAMPLERS["test_dpms"](cfg).start()
    assert os.path.exists(out)


def test_autoencoding_example(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack, image_index=0,
        encoder_ddim_style="ddim5", decoder_ddim_style="ddim5",
        output_path=str(tmp_path / "ae_example.png"))
    out = SAMPLERS["autoencoding_example"](cfg).start()
    assert os.path.exists(out)


def test_autoencoding_eval_metrics(stack):
    cfg = _pdae_sampler_config(
        stack, encoder_ddim_style="ddim10", decoder_ddim_style="ddim5",
        batch_size=8, max_samples=8)
    results = SAMPLERS["autoencoding_eval"](cfg).start()
    assert 0.0 <= results["ssim"] <= 1.0
    assert results["mse"] >= 0.0


def test_infer_latents(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack, batch_size=8, max_samples=16,
        output_path=str(tmp_path / "synthetic.ckpt"))
    out = SAMPLERS["infer_latents"](cfg).start()
    from pdae_tpu.utils import load_checkpoint
    raw = load_checkpoint(out)
    assert raw["mean"].shape == (8,) and raw["std"].shape == (8,)
    assert np.all(raw["std"] > 0)


def test_gap_measure(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack, batch_size=4, num_samples=4,
        output_path=str(tmp_path / "gap.png"))
    gap, ae_gap = SAMPLERS["gap_measure"](cfg).start()
    assert gap.shape == (20,) and np.all(np.isfinite(gap))


def test_denoise_one_step(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack, image_index=1, timestep_list=[5, 10, 15],
        output_path=str(tmp_path / "one_step.png"))
    out = SAMPLERS["denoise_one_step"](cfg).start()
    assert os.path.exists(out)


def test_interpolation(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack, image_index_1=0, image_index_2=1, ddim_style="ddim5",
        alphas=[0.0, 0.5, 1.0],
        output_path=str(tmp_path / "interp.png"))
    out = SAMPLERS["interpolation"](cfg).start()
    assert os.path.exists(out)


def test_manipulation(stack, tmp_path):
    # an explicit class_id is honored directly (attribute names are the
    # alternative selector; an unknown name raises instead of silently
    # editing the default class)
    cfg = _pdae_sampler_config(
        stack,
        image_index=0,
        inferred_latents_path=stack["latents"],
        classifier_checkpoint_path=stack["manip_ckpt"],
        num_classes=5, class_id=2,
        scale_list=[-0.3, 0.3],
        encode_ddim_style="ddim5", decode_ddim_style="ddim5",
        output_path=str(tmp_path / "manip.png"))
    out = SAMPLERS["manipulation"](cfg).start()
    assert os.path.exists(out)

    import pytest as _pytest
    bad = dict(cfg)
    bad["attribute"] = "NOT_AN_ATTR"
    with _pytest.raises(ValueError, match="unknown attribute"):
        SAMPLERS["manipulation"](bad).start()


def test_unconditional_sample_with_fid(stack, tmp_path):
    cfg = _pdae_sampler_config(
        stack,
        latent_config_path=stack["latent_cfg"],
        latent_checkpoint_path=stack["lat_ckpt"],
        inferred_latents_path=stack["latents"],
        num_samples=4, batch_size=4,
        latent_ddim_style="ddim5", decoder_ddim_style="ddim5",
        output_path=str(tmp_path / "uncond.png"))
    out = SAMPLERS["unconditional_sample"](cfg).start()
    assert os.path.exists(out)


def test_multichip_sampler_sharding_invariance():
    """Sampler batches sharded over all 8 local devices (pad_shard_batch +
    replicated params) produce the SAME images as a single-device run --
    the GSPMD multi-chip sampling path is semantics-preserving."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import UNet
    from pdae_tpu.parallel import local_mesh, pad_shard_batch, replicate
    from pdae_tpu.utils import init_key

    model = UNet(input_channel=3, base_channel=8, channel_multiplier=(1, 2),
                 num_residual_blocks_of_a_block=1, attention_resolutions=(2,),
                 num_heads=1, head_channel=-1, use_new_attention_order=False,
                 dropout=0.0)
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(init_key(0), x, t, None)["params"]
    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})

    @jax.jit
    def fn(p, x_T):
        return gd.ddim_sample(
            "ddim4", lambda xx, tt, cc=None: model.apply({"params": p},
                                                         xx, tt, cc), x_T)

    x_T = jax.random.normal(jax.random.PRNGKey(1), (9, 8, 8, 3))
    plain = np.asarray(fn(params, x_T))                    # single device

    mesh = local_mesh()
    assert mesh.devices.size == 8
    sharded_x, real = pad_shard_batch(mesh, x_T)
    assert real == 9 and sharded_x.shape[0] == 16          # wrap-padded
    repl_params = replicate(mesh, params)
    sharded = np.asarray(fn(repl_params, sharded_x))[:real]

    np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-6)


def test_samplers_accept_dpm_solver_styles(stack, tmp_path):
    """'dpm<N>' fast-decode styles (diffusion/dpm_solver.py) run through the
    real sampler stack end to end: autoencoding eval decodes with the 2M
    solver, and the unconditional pipeline uses it for BOTH the latent DPM
    and the shift decode."""
    cfg = _pdae_sampler_config(
        stack, encoder_ddim_style="ddim10", decoder_ddim_style="dpm5",
        batch_size=8, max_samples=8)
    results = SAMPLERS["autoencoding_eval"](cfg).start()
    assert 0.0 <= results["ssim"] <= 1.0

    # fast ENCODE too: both legs on the solver (the
    # autoencoding_eval_fast.yml pattern -- 1100 NFE -> 2N)
    cfg = _pdae_sampler_config(
        stack, encoder_ddim_style="dpm5", decoder_ddim_style="dpm5",
        batch_size=8, max_samples=8)
    results = SAMPLERS["autoencoding_eval"](cfg).start()
    assert 0.0 <= results["ssim"] <= 1.0

    cfg = _pdae_sampler_config(
        stack,
        latent_config_path=stack["latent_cfg"],
        latent_checkpoint_path=stack["lat_ckpt"],
        inferred_latents_path=stack["latents"],
        num_samples=4, batch_size=4,
        latent_ddim_style="dpm5", decoder_ddim_style="dpm5",
        output_path=str(tmp_path / "uncond_dpm.png"))
    out = SAMPLERS["unconditional_sample"](cfg).start()
    assert os.path.exists(out)


def test_sample_cli_set_overrides(stack, tmp_path, capsys):
    """scripts/sample.py --set overrides top-level config fields (e.g.
    switching a YAML run to the fast dpm styles without editing it)."""
    import sys

    import yaml

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import sample as sample_cli

    cfg = _pdae_sampler_config(
        stack, encoder_ddim_style="ddim10", decoder_ddim_style="ddim10",
        batch_size=8, max_samples=8)
    path = str(tmp_path / "cfg.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    sample_cli.main([
        "--sampler", "autoencoding_eval", "--config", path,
        "--set", "decoder_ddim_style=dpm5",
        "--set", "encoder_ddim_style=dpm5",
        "--set", "batch_size=8"])
    out = capsys.readouterr().out
    assert "autoencoding_eval: done" in out and "ssim" in out
