"""End-to-end smoke tests for the regular DDPM trainer: train a tiny UNet
on synthetic data, checkpoint, resume, sample."""

import os

import jax
import numpy as np
import pytest

from pdae_tpu.training import RegularDiffusionTrainer

TINY_CONFIG = {
    "train_dataset_config": {
        "name": "SYNTHETIC", "image_size": 16, "image_channel": 1,
        "length": 64,
    },
    "eval_dataset_config": {"length": 16},
    "diffusion_config": {"timesteps": 50, "betas_type": "linear"},
    "denoise_fn_config": {
        "model": "UNet", "input_channel": 1, "base_channel": 8,
        "channel_multiplier": [1, 2], "num_residual_blocks_of_a_block": 1,
        "attention_resolutions": [2], "num_heads": 1, "head_channel": -1,
        "use_new_attention_order": False, "dropout": 0.0,
    },
    "dataloader_config": {
        "train": {"num_workers": 1, "batch_size": 8},
        "eval": {"num_generations": 4},
    },
    "optimizer_config": {
        "lr": 1e-3, "adam_betas": "(0.9, 0.999)", "adam_eps": 1e-8,
        "weight_decay": 0.0, "enable_amp": False,
    },
    "runner_config": {
        "display_steps": 2, "evaluate_every_steps": 1000,
        "save_latest_every_steps": 3, "save_checkpoint_every_steps": 1000,
        "num_iterations": 1, "ema_every": 1, "ema_decay": 0.5,
        "compile": False,
    },
}


def test_train_loss_decreases_and_ckpt_roundtrip(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=TINY_CONFIG, run_path=run)
    # conftest forces an 8-device CPU platform: the whole suite exercises
    # true 8-way data parallelism (batch sharded, params replicated)
    assert len(tr.mesh.devices.ravel()) == 8
    p0 = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
    tr.train(max_steps=6)
    assert int(tr.state.step) == 6
    p1 = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert os.path.exists(os.path.join(run, "checkpoints", "latest.ckpt"))
    assert os.path.exists(os.path.join(run, "config.yml"))

    # resume restores step and params exactly
    tr2 = RegularDiffusionTrainer(config=TINY_CONFIG, run_path=run,
                                  resume="latest")
    assert tr2.start_step == 6
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.opt_state),
                    jax.tree_util.tree_leaves(tr2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_tracks_params(tmp_path):
    tr = RegularDiffusionTrainer(config=TINY_CONFIG,
                                 run_path=str(tmp_path / "run"))
    tr.train(max_steps=3)
    # with decay 0.5 EMA moves toward params but isn't equal
    p = jax.tree_util.tree_leaves(tr.state.params)[0]
    e = jax.tree_util.tree_leaves(tr.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_grad_accumulation_matches_big_batch(tmp_path):
    """num_iterations=2 with micro-batch 4 sees the same 8 samples as one
    batch of 8; losses should be finite and the step count equal."""
    cfg = {**TINY_CONFIG,
           "runner_config": {**TINY_CONFIG["runner_config"],
                             "num_iterations": 2},
           "dataloader_config": {"train": {"num_workers": 1, "batch_size": 4},
                                 "eval": {"num_generations": 4}}}
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
    tr.train(max_steps=2)
    assert int(tr.state.step) == 2


def test_evaluate_writes_grid(tmp_path):
    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=TINY_CONFIG, run_path=run)
    tr.train(max_steps=1)
    tr.evaluate(1, ddim_style="ddim5")
    assert os.path.exists(os.path.join(run, "samples", "step-1.png"))


def test_conditional_training(tmp_path):
    cfg = {**TINY_CONFIG,
           "denoise_fn_config": {**TINY_CONFIG["denoise_fn_config"],
                                 "num_class": 10}}
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
    tr.train(max_steps=2)
    assert int(tr.state.step) == 2
    # eval must SAMPLE WITH CONDITIONS (classes cycled): the conditional
    # UNet asserts condition is not None, so an unconditioned eval (the
    # reference's behavior, train_regular_diffusion.py:150-153) would crash
    tr.evaluate(2, ddim_style="ddim2")
    assert os.path.exists(os.path.join(str(tmp_path / "run"), "samples",
                                       "step-2.png"))


def test_ema_every_gating():
    from pdae_tpu.training.state import maybe_ema_update
    import jax.numpy as jnp
    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    # step 2 with every=2: update happens
    out = maybe_ema_update(jnp.asarray(2), ema, params, 0.5, 2)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.5)
    # step 3 with every=2: unchanged
    out = maybe_ema_update(jnp.asarray(3), ema, params, 0.5, 2)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)


def test_resume_is_bitwise_deterministic(tmp_path):
    """A preempted-and-resumed run reproduces the uninterrupted run
    EXACTLY: the loader fast-forwards to the batch an uninterrupted run
    would consume (the reference restarts its data cycle on --resume and
    diverges), and params/opt-state/EMA round-trip losslessly."""
    cfg = {**TINY_CONFIG,
           "runner_config": {**TINY_CONFIG["runner_config"],
                             "save_latest_every_steps": 10**6}}

    run_a = str(tmp_path / "straight")
    tr_a = RegularDiffusionTrainer(config=cfg, run_path=run_a)
    tr_a.train(max_steps=9)   # crosses an epoch boundary (64/8 = 8 b/epoch)

    run_b = str(tmp_path / "resumed")
    tr_b1 = RegularDiffusionTrainer(config=cfg, run_path=run_b)
    tr_b1.train(max_steps=5)  # final save leaves latest.ckpt at step 5
    tr_b2 = RegularDiffusionTrainer(config=cfg, run_path=run_b,
                                    resume="latest")
    assert tr_b2.start_step == 5
    tr_b2.train(max_steps=9)

    flat_a = jax.tree_util.tree_leaves(
        {"p": tr_a.state.params, "e": tr_a.state.ema_params})
    flat_b = jax.tree_util.tree_leaves(
        {"p": tr_b2.state.params, "e": tr_b2.state.ema_params})
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigint_checkpoints_and_stops(tmp_path):
    """Preemption safety: a SIGINT mid-run stops the loop promptly and
    leaves a checkpoint (single-process: immediate; multi-process runs
    reach consensus at the next display boundary instead)."""
    import os as _os
    import signal as _signal

    run = str(tmp_path / "run")
    tr = RegularDiffusionTrainer(config=TINY_CONFIG, run_path=run)
    inner = tr._train_step
    count = {"n": 0}

    def wrapped(state, batch):
        count["n"] += 1
        if count["n"] == 2:
            _os.kill(_os.getpid(), _signal.SIGINT)
        return inner(state, batch)

    tr._train_step = wrapped
    stopped_at = tr.train(max_steps=50)
    assert stopped_at == 2
    assert os.path.exists(os.path.join(run, "checkpoints", "latest.ckpt"))
    tr2 = RegularDiffusionTrainer(config=TINY_CONFIG, run_path=run,
                                  resume="latest")
    assert tr2.start_step == 2


def test_unknown_optimizer_name_rejected():
    from pdae_tpu.training.state import make_optimizer

    with pytest.raises(ValueError, match="optimizer_config.name"):
        make_optimizer({"lr": 1e-3, "name": "SGD"})


def test_remat_recomputes_training_forward(tmp_path):
    """runner_config.remat must checkpoint the TRAINING forward (it used
    to wrap only the no-backward eval sampler -- a silent no-op).  Same
    losses, and the compiled train step contains strictly more
    convolutions (the rematerialized forward runs again in the backward
    pass)."""
    import copy as _copy

    def conv_count(tr):
        batch = next(tr._batch_iterator(0))
        txt = tr._train_step.lower(tr.state, batch).compile().as_text()
        return txt.count("convolution")

    base = _copy.deepcopy(TINY_CONFIG)
    tr0 = RegularDiffusionTrainer(config=base, run_path=str(tmp_path / "a"))
    cfg = _copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["remat"] = True
    tr1 = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "b"))

    c0, c1 = conv_count(tr0), conv_count(tr1)
    assert c1 > c0, (c0, c1)

    tr0.train(max_steps=2)
    tr1.train(max_steps=2)
    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    np.testing.assert_allclose(losses(str(tmp_path / "a")),
                               losses(str(tmp_path / "b")), rtol=1e-5)


def test_remat_skips_saves_trunk(tmp_path):
    """``remat: skips`` keeps the tagged UNet skip activations saved
    (models/unet.py checkpoint_name + steps.py::remat_wrap policy): the
    emitted backward recomputes strictly fewer convolutions than full
    remat but more than no remat -- with identical losses in all three
    modes.  Counted at the jaxpr level: optimized-HLO string counts are
    confounded by XLA CSE (full remat's duplicate convs CSE more)."""
    import copy as _copy
    import json

    def make(mode, name):
        cfg = _copy.deepcopy(TINY_CONFIG)
        if mode is not None:
            cfg["runner_config"]["remat"] = mode
        return RegularDiffusionTrainer(config=cfg,
                                       run_path=str(tmp_path / name))

    def conv_count(tr):
        batch = next(tr._batch_iterator(0))
        jaxpr = jax.make_jaxpr(tr._train_step.__wrapped__)(tr.state, batch)
        return str(jaxpr).count("conv_general_dilated")

    trainers = {"none": make(None, "none"), "full": make(True, "full"),
                "skips": make("skips", "skips")}
    counts = {k: conv_count(tr) for k, tr in trainers.items()}
    assert counts["none"] < counts["skips"] < counts["full"], counts

    for tr in trainers.values():
        tr.train(max_steps=2)

    def losses(name):
        with open(os.path.join(str(tmp_path / name), "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]

    np.testing.assert_allclose(losses("none"), losses("full"), rtol=1e-5)
    np.testing.assert_allclose(losses("none"), losses("skips"), rtol=1e-5)


def test_representation_step_remat_modes_equal():
    """The PDAE train step produces the same updated params under
    remat off / full / "skips" (the remat policy must not change math),
    and "skips" recomputes less than full (HLO convolution count)."""
    import jax.numpy as jnp

    import __graft_entry__ as g
    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import SemanticEncoder, ShiftUNet
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})
    decoder = ShiftUNet(latent_dim=16, **g.TINY_DPM)
    encoder = SemanticEncoder(16, channels=(8, 16), attn_after_stage=2)
    x = jnp.zeros((1, 16, 16, 3))
    enc_params = jax.jit(encoder.init)(init_key(0), x)["params"]
    dec_params = jax.jit(decoder.init)(
        init_key(1), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16)))["params"]
    shift_params, frozen = split_shift_unet(dec_params)
    tx = make_optimizer({"lr": 1e-3})
    x_0 = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3),
                      jnp.float32) * 2 - 1
    rng = jax.random.PRNGKey(7)

    results, convs = {}, {}
    for mode in (False, True, "skips"):
        step = make_representation_train_step(gd, encoder, decoder, tx,
                                              remat=mode)
        state = TrainState.create(
            {"encoder": enc_params, "shift": shift_params}, tx)
        jaxpr = jax.make_jaxpr(step)(state, frozen, x_0, rng)
        convs[mode] = str(jaxpr).count("conv_general_dilated")
        new_state, loss = jax.jit(step)(state, frozen, x_0, rng)
        results[mode] = (jax.tree_util.tree_leaves(new_state.params),
                         float(loss))

    assert convs[False] < convs["skips"] < convs[True], convs
    for mode in (True, "skips"):
        np.testing.assert_allclose(results[mode][1], results[False][1],
                                   rtol=1e-5)
        for a, b in zip(results[mode][0], results[False][0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_representation_step_microbatched():
    """num_iters=2 splits the batch into a grad-accumulation lax.scan
    (the reference's num_iterations for stage 2,
    train_representation_learning.py:72-97): the step must run, produce a
    finite loss, update the params, and actually contain a scanned body
    (two micro-forwards are not unrolled)."""
    import jax.numpy as jnp

    import __graft_entry__ as g
    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import SemanticEncoder, ShiftUNet
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    gd = GaussianDiffusion({"timesteps": 20, "betas_type": "linear"})
    decoder = ShiftUNet(latent_dim=16, **g.TINY_DPM)
    encoder = SemanticEncoder(16, channels=(8, 16), attn_after_stage=2)
    x = jnp.zeros((1, 16, 16, 3))
    enc_params = jax.jit(encoder.init)(init_key(0), x)["params"]
    dec_params = jax.jit(decoder.init)(
        init_key(1), x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16)))["params"]
    shift_params, frozen = split_shift_unet(dec_params)
    tx = make_optimizer({"lr": 1e-3})
    x_0 = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3),
                      jnp.float32) * 2 - 1
    rng = jax.random.PRNGKey(7)

    step = make_representation_train_step(gd, encoder, decoder, tx,
                                          num_iters=2)
    state = TrainState.create(
        {"encoder": enc_params, "shift": shift_params}, tx)
    jaxpr = str(jax.make_jaxpr(step)(state, frozen, x_0, rng))
    assert "scan" in jaxpr
    new_state, loss = jax.jit(step)(state, frozen, x_0, rng)
    assert np.isfinite(float(loss))
    changed = [not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(state.params),
                               jax.tree_util.tree_leaves(new_state.params))]
    assert any(changed)


def test_train_cli_set_overrides(tmp_path, capsys):
    """scripts/train.py --set dotted.key=value: flip the smoke config to
    fsdp + sharded checkpoints from the command line and verify both took
    effect end to end."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import train as train_cli

    run = str(tmp_path / "run")
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "synthetic_smoke.yml")
    train_cli.main([
        "--config_path", cfg, "--run_path", run, "--max_steps", "2",
        "--set", "runner_config.param_sharding=fsdp",
        "--set", "runner_config.checkpoint_format=sharded",
        "--set", "runner_config.fsdp_min_size=256"])
    assert "RegularDiffusionTrainer" in capsys.readouterr().out
    from pdae_tpu.utils import is_sharded_checkpoint, load_yaml
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    assert is_sharded_checkpoint(latest)
    saved = load_yaml(os.path.join(run, "config.yml"))
    assert saved["runner_config"]["param_sharding"] == "fsdp"


def test_train_continues_across_calls(tmp_path):
    """A second in-process train() call continues from the LIVE
    state.step (same data fast-forward as a checkpoint resume) instead
    of replaying its steps and batches: segmented == straight, bitwise.
    (Before round 5 the loop counter restarted at start_step, so a
    second call silently re-ran max_steps fresh steps -- the bug that
    skewed the segment-timed loop benches.)"""
    import copy
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["save_latest_every_steps"] = 10 ** 6
    seg = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "a"))
    seg.train(max_steps=3, save_on_exit=False)
    assert int(seg.state.step) == 3
    seg.train(max_steps=8, save_on_exit=False)
    assert int(seg.state.step) == 8

    straight = RegularDiffusionTrainer(config=cfg,
                                       run_path=str(tmp_path / "b"))
    straight.train(max_steps=8, save_on_exit=False)
    for a, b in zip(jax.tree_util.tree_leaves(seg.state.params),
                    jax.tree_util.tree_leaves(straight.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
