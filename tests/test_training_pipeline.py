"""Full 4-stage PDAE pipeline on tiny models: DPM -> representation
learning (frozen trunk) -> latent DPM -> manipulation classifier.

This is the composition graph the reference builds across
trainer/train_*.py; every stage consumes the previous stage's checkpoint
by logical key."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.training import (LatentDiffusionTrainer, ManipulationTrainer,
                               RegularDiffusionTrainer,
                               RepresentationLearningTrainer)
from pdae_tpu.training.partition import split_shift_unet
from pdae_tpu.utils import load_checkpoint, save_checkpoint

DDPM_MODEL = {
    "model": "UNet", "input_channel": 1, "base_channel": 8,
    "channel_multiplier": [1, 2], "num_residual_blocks_of_a_block": 1,
    "attention_resolutions": [2], "num_heads": 1, "head_channel": -1,
    "use_new_attention_order": False, "dropout": 0.0,
}

DS = {"name": "SYNTHETIC", "image_size": 16, "image_channel": 1,
      "length": 32}

RUNNER = {"display_steps": 100, "evaluate_every_steps": 100000,
          "save_latest_every_steps": 100000,
          "save_checkpoint_every_steps": 100000, "num_iterations": 1,
          "ema_every": 1, "ema_decay": 0.9, "compile": False}

OPT = {"lr": 1e-3, "adam_betas": "(0.9, 0.999)", "adam_eps": 1e-8,
       "weight_decay": 0.0, "enable_amp": False}

DIFFUSION = {"timesteps": 20, "betas_type": "linear"}


@pytest.fixture(scope="module")
def stage_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")

    # ---- stage 1: tiny DPM ------------------------------------------- #
    ddpm_cfg = {
        "train_dataset_config": DS, "eval_dataset_config": {},
        "diffusion_config": DIFFUSION, "denoise_fn_config": DDPM_MODEL,
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 4}},
        "optimizer_config": OPT, "runner_config": RUNNER,
    }
    dpm_run = str(root / "dpm")
    tr = RegularDiffusionTrainer(config=ddpm_cfg, run_path=dpm_run)
    tr.train(max_steps=2)

    # ---- stage 2: representation learning ----------------------------- #
    pdae_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 16},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_ddpm_checkpoint": os.path.join(dpm_run, "checkpoints",
                                                "latest.ckpt"),
        "encoder_config": {"model": "CELEBA64Encoder_TINY", "latent_dim": 16},
        "decoder_config": {"model": "ShiftUNet", "latent_dim": 16},
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 2}},
        "optimizer_config": OPT, "runner_config": RUNNER,
    }
    return root, ddpm_cfg, pdae_cfg, dpm_run


def test_stage2_representation_learning(stage_dirs, monkeypatch):
    root, ddpm_cfg, pdae_cfg, dpm_run = stage_dirs
    # tiny encoder override: use 64px geometry class but 16px input -> use
    # custom channels via encoder_for_resolution? Patch build_encoder inputs:
    from pdae_tpu.models.encoder import SemanticEncoder
    import pdae_tpu.training.representation as rep

    def tiny_encoder(config, image_size=None, dtype=jnp.float32):
        return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                               attn_after_stage=2, dtype=dtype)

    monkeypatch.setattr(rep, "build_encoder", tiny_encoder)

    run = str(root / "pdae")
    tr = RepresentationLearningTrainer(config=pdae_cfg, run_path=run)

    # the trunk must equal the stage-1 EMA weights after grafting
    dpm_raw = load_checkpoint(os.path.join(dpm_run, "checkpoints",
                                           "latest.ckpt"))
    for key in ("time_embed", "middle_block_0"):
        a = jax.tree_util.tree_leaves(tr.frozen_params[key])
        b = jax.tree_util.tree_leaves(dpm_raw["ema_denoise_fn"][key])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    frozen_before = jax.tree_util.tree_map(np.asarray, tr.frozen_params)
    tr.train(max_steps=2)
    # frozen trunk bit-identical after training
    for x, y in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(tr.frozen_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # trainable parts moved
    p0 = jax.tree_util.tree_leaves(tr.state.params["encoder"])[0]
    assert np.isfinite(np.asarray(p0)).all()
    assert int(tr.state.step) == 2

    tr.save(2)
    raw = load_checkpoint(os.path.join(run, "checkpoints", "latest.ckpt"))
    assert set(raw) >= {"step", "encoder", "ema_encoder", "decoder",
                        "ema_decoder", "optimizer"}
    # saved decoder contains both trunk and shift branch
    shift, frozen = split_shift_unet(raw["decoder"])
    assert shift and frozen

    # resume round-trips
    tr2 = RepresentationLearningTrainer(config=pdae_cfg, run_path=run,
                                        resume="latest")
    assert tr2.start_step == 2

    # stash stats + paths for later stages
    z_list = []
    enc = tr.encoder
    for i in range(8):
        item = tr.train_dataset[i]
        z = enc.apply({"params": tr.state.ema_params["encoder"]},
                      jnp.asarray(item["x_0"])[None])
        z_list.append(np.asarray(z)[0])
    zs = np.stack(z_list)
    save_checkpoint(str(root / "latents.ckpt"),
                    {"mean": zs.mean(0), "std": zs.std(0) + 1e-5})


def test_stage3_latent_and_stage4_manipulation(stage_dirs, monkeypatch):
    root, ddpm_cfg, pdae_cfg, dpm_run = stage_dirs
    from pdae_tpu.models.encoder import SemanticEncoder
    import pdae_tpu.training.latent as lat
    import pdae_tpu.training.manipulation as man

    def tiny_encoder(config, image_size=None, dtype=jnp.float32):
        return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                               attn_after_stage=2, dtype=dtype)

    monkeypatch.setattr(lat, "build_encoder", tiny_encoder)
    monkeypatch.setattr(man, "build_encoder", tiny_encoder)

    pdae_ckpt = str(root / "pdae" / "checkpoints" / "latest.ckpt")
    assert os.path.exists(pdae_ckpt), "stage 2 must run first"

    latent_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 16},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": pdae_cfg,
        "trained_representation_learning_checkpoint": pdae_ckpt,
        "inferred_latents": str(root / "latents.ckpt"),
        "latent_denoise_fn_config": {
            "model": "MLPSkipNet", "input_channel": 16, "model_channel": 32,
            "num_layers": 3, "time_emb_channel": 8, "use_norm": True,
            "dropout": 0.0},
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 2}},
        "optimizer_config": {**OPT, "name": "AdamW", "weight_decay": 0.01},
        "runner_config": RUNNER,
    }
    run3 = str(root / "latent")
    tr3 = LatentDiffusionTrainer(config=latent_cfg, run_path=run3)
    tr3.train(max_steps=2)
    assert int(tr3.state.step) == 2
    tr3.evaluate(2, latent_ddim_style="ddim5", decoder_ddim_style="ddim5")
    assert os.path.exists(os.path.join(run3, "samples", "sample0k.png"))
    raw3 = load_checkpoint(os.path.join(run3, "checkpoints", "latest.ckpt"))
    assert "ema_latent_denoise_fn" in raw3

    manip_cfg = {
        "train_dataset_config": {**DS, "latent_dim": 16, "multilabel": 5},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": pdae_cfg,
        "trained_representation_learning_checkpoint": pdae_ckpt,
        "inferred_latents": str(root / "latents.ckpt"),
        "num_classes": 5,
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 1}},
        "optimizer_config": OPT, "runner_config": RUNNER,
    }
    run4 = str(root / "manip")
    tr4 = ManipulationTrainer(config=manip_cfg, run_path=run4)
    tr4.train(max_steps=3)
    assert int(tr4.state.step) == 3
    tr4.evaluate(3, encode_style="ddim5", decode_style="ddim5",
                 class_id=2, scale=0.3)
    assert os.path.exists(os.path.join(run4, "samples", "sample0k.png"))
    raw4 = load_checkpoint(os.path.join(run4, "checkpoints", "latest.ckpt"))
    assert "ema_classifier" in raw4
