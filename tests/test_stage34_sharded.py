"""Sharded parameter placement on pipeline stages 3-4 (latent DPM +
manipulation classifier).

Round-3 gap (VERDICT.md "What's weak" #1): every fsdp/tp/composed test
drove stages 1-2 only; ``LatentDiffusionTrainer`` and
``ManipulationTrainer`` route their big frozen encoder/decoder trees
through ``BaseTrainer._place_frozen`` and their evals through
``_eval_local``, but none of that had ever executed sharded.  These tests
run both trainers under ``param_sharding: fsdp / tp / fsdp+tp`` on the
suite's 8-device CPU mesh and assert, per the verdict's checklist:

(a) loss-equality with the replicated run,
(b) the frozen encoder/decoder leaves are actually sharded (and stay
    bit-stable through training),
(c) the eval path (full latent->image pipeline / manipulation encode+
    decode) executes and produces the replicated run's grids,
(d) sharded-checkpoint save/resume round-trips for the latent stage.

The TP x MLPSkipNet cell (TP's own documented sweet spot, PERF.md "rule
of thumb": the 2048-wide Dense layers) gets a flagship-width fwd+bwd
compile wrapped in the SPMD-degradation guard.

Reference DDP counterparts: /root/reference/trainer/
train_latent_diffusion.py:33, train_manipulation.py:32 (replication-only).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pdae_tpu.training import LatentDiffusionTrainer, ManipulationTrainer
from pdae_tpu.utils import init_key, save_checkpoint

DDPM_MODEL = {
    "model": "UNet", "input_channel": 1, "base_channel": 8,
    "channel_multiplier": [1, 2], "num_residual_blocks_of_a_block": 1,
    "attention_resolutions": [2], "num_heads": 1, "head_channel": -1,
    "use_new_attention_order": False, "dropout": 0.0,
}

DS = {"name": "SYNTHETIC", "image_size": 16, "image_channel": 1,
      "length": 32}

DIFFUSION = {"timesteps": 20, "betas_type": "linear"}

OPT = {"lr": 1e-3, "adam_betas": "(0.9, 0.999)", "adam_eps": 1e-8,
       "weight_decay": 0.0, "enable_amp": False}

RUNNER = {"display_steps": 2, "evaluate_every_steps": 100000,
          "save_latest_every_steps": 100000,
          "save_checkpoint_every_steps": 100000, "num_iterations": 1,
          "ema_every": 1, "ema_decay": 0.9, "compile": False}

PDAE_CFG = {
    "encoder_config": {"model": "CELEBA64Encoder_TINY", "latent_dim": 16},
    "decoder_config": {"model": "ShiftUNet", "latent_dim": 16},
    "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
    "diffusion_config": DIFFUSION,
}

MODES = ["fsdp", "tp", "fsdp+tp"]


def _tiny_encoder(config, image_size=None, dtype=jnp.float32):
    from pdae_tpu.models.encoder import SemanticEncoder
    return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                           attn_after_stage=2, dtype=dtype)


def patch_tiny_encoders(mp: pytest.MonkeyPatch):
    """Route stage-3/4 trainers' encoder factory to the CPU-sized one."""
    import pdae_tpu.training.latent as lat
    import pdae_tpu.training.manipulation as man
    mp.setattr(lat, "build_encoder", _tiny_encoder)
    mp.setattr(man, "build_encoder", _tiny_encoder)


def build_stage34_artifacts(root):
    """Synthesized stage-2 artifact (no need to train stages 1-2: the
    machinery under test only needs shape-correct, non-trivial frozen
    trees).  Every leaf is perturbed -- fresh UNets have zero-init output
    convs and would output EXACTLY zero, making eval-path comparisons
    blind (round-2 parity-suite lesson)."""
    from pdae_tpu.models import build_decoder
    enc = _tiny_encoder({"latent_dim": 16})
    dec = build_decoder({"model": "ShiftUNet", "latent_dim": 16}, DDPM_MODEL)
    x = jnp.zeros((1, 16, 16, 1))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, 16))
    ep = jax.jit(enc.init)(init_key(0), x)["params"]
    dp = jax.jit(dec.init)(init_key(1), x, t, z)["params"]

    rs = np.random.RandomState(0)

    def perturb(tree):
        return jax.tree_util.tree_map(
            lambda l: (np.asarray(l)
                       + 0.02 * rs.standard_normal(l.shape)).astype(
                           np.asarray(l).dtype), tree)

    save_checkpoint(str(root / "pdae.ckpt"),
                    {"ema_encoder": perturb(ep), "ema_decoder": perturb(dp)})
    save_checkpoint(str(root / "latents.ckpt"),
                    {"mean": (0.1 * rs.standard_normal(16)).astype(
                         np.float32),
                     "std": (0.5 + rs.rand(16)).astype(np.float32)})


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    mp = pytest.MonkeyPatch()
    patch_tiny_encoders(mp)
    root = tmp_path_factory.mktemp("stage34")
    build_stage34_artifacts(root)
    yield root
    mp.undo()


def _shard_opts(mode):
    opts = {"param_sharding": mode, "fsdp_min_size": 256}
    if "tp" in mode:
        opts["tp_size"] = 2
    return opts


def latent_cfg(root, mode=None, extra=None):
    cfg = {
        "train_dataset_config": {**DS, "latent_dim": 16},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": PDAE_CFG,
        "trained_representation_learning_checkpoint":
            str(root / "pdae.ckpt"),
        "inferred_latents": str(root / "latents.ckpt"),
        "latent_denoise_fn_config": {
            "model": "MLPSkipNet", "input_channel": 16, "model_channel": 32,
            "num_layers": 3, "time_emb_channel": 8, "use_norm": True,
            "dropout": 0.0},
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 2}},
        "optimizer_config": {**OPT, "name": "AdamW", "weight_decay": 0.01},
        "runner_config": dict(RUNNER),
    }
    if mode:
        cfg["runner_config"].update(_shard_opts(mode))
    if extra:
        cfg["runner_config"].update(extra)
    return cfg


def manip_cfg(root, mode=None, extra=None):
    cfg = {
        "train_dataset_config": {**DS, "latent_dim": 16, "multilabel": 5},
        "eval_dataset_config": {},
        "diffusion_config": DIFFUSION,
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": PDAE_CFG,
        "trained_representation_learning_checkpoint":
            str(root / "pdae.ckpt"),
        "inferred_latents": str(root / "latents.ckpt"),
        "num_classes": 5,
        "dataloader_config": {"train": {"num_workers": 1, "batch_size": 8},
                              "eval": {"num_generations": 1}},
        "optimizer_config": dict(OPT),
        "runner_config": dict(RUNNER),
    }
    if mode:
        cfg["runner_config"].update(_shard_opts(mode))
    if extra:
        cfg["runner_config"].update(extra)
    return cfg


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _losses(run, key):
    out = []
    with open(os.path.join(run, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if key in rec:
                out.append(rec[key])
    return out


def _sharded_leaves(tree):
    return [l for l in _leaves(tree) if not l.sharding.is_fully_replicated]


def _grid(run):
    from PIL import Image
    return np.asarray(Image.open(
        os.path.join(run, "samples", "sample0k.png")))


# -- replicated baselines (one per trainer, shared across modes) ---------- #

@pytest.fixture(scope="module")
def latent_baseline(artifacts, tmp_path_factory):
    run = str(tmp_path_factory.mktemp("latent_rep"))
    tr = LatentDiffusionTrainer(config=latent_cfg(artifacts), run_path=run)
    tr.train(max_steps=4)
    tr.evaluate(4, latent_ddim_style="ddim5", decoder_ddim_style="ddim5")
    return {"losses": _losses(run, "prediction_loss"),
            "params": [np.asarray(l) for l in _leaves(tr.state.params)],
            "grid": _grid(run)}


@pytest.fixture(scope="module")
def manip_baseline(artifacts, tmp_path_factory):
    run = str(tmp_path_factory.mktemp("manip_rep"))
    tr = ManipulationTrainer(config=manip_cfg(artifacts), run_path=run)
    tr.train(max_steps=4)
    tr.evaluate(4, encode_style="ddim5", decode_style="ddim5",
                class_id=2, scale=0.3)
    return {"losses": _losses(run, "bce_loss"),
            "params": [np.asarray(l) for l in _leaves(tr.state.params)],
            "grid": _grid(run)}


# -- (a)-(c): per-mode equivalence ---------------------------------------- #

@pytest.mark.parametrize("mode", MODES)
def test_latent_trainer_sharded_matches_replicated(artifacts, latent_baseline,
                                                   tmp_path, mode):
    run = str(tmp_path / mode)
    tr = LatentDiffusionTrainer(config=latent_cfg(artifacts, mode),
                                run_path=run)

    # (b) the frozen stage trees went through _place_frozen SHARDED
    assert _sharded_leaves(tr.encoder_params), \
        f"{mode}: frozen encoder not sharded"
    assert _sharded_leaves(tr.decoder_params), \
        f"{mode}: frozen decoder not sharded"
    # trainable MLP state + EMA + adam moments sharded too
    assert _sharded_leaves(tr.state.params), f"{mode}: MLP params not sharded"
    assert _sharded_leaves(tr.state.ema_params)
    assert _sharded_leaves(tr.state.opt_state)

    frozen_before = [np.asarray(l) for l in _leaves(tr.encoder_params)]
    tr.train(max_steps=4)

    # sharding persisted through the pinned-out_shardings step
    assert _sharded_leaves(tr.state.params)
    # frozen tree bit-stable (never touched by the optimizer)
    for before, after in zip(frozen_before, _leaves(tr.encoder_params)):
        np.testing.assert_array_equal(before, np.asarray(after))

    # (a) loss-equality with the replicated run (same data stream + rng
    # discipline; reduction-order bounds as in test_fsdp.py)
    losses = _losses(run, "prediction_loss")
    assert losses and len(losses) == len(latent_baseline["losses"])
    np.testing.assert_allclose(losses, latent_baseline["losses"], rtol=1e-4)
    for a, b in zip(latent_baseline["params"], _leaves(tr.state.params)):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-3)

    # (c) the full latent->image eval pipeline executes sharded and
    # reproduces the replicated grid (uint8 rounding can flip by 1)
    tr.evaluate(4, latent_ddim_style="ddim5", decoder_ddim_style="ddim5")
    grid = _grid(run)
    assert grid.shape == latent_baseline["grid"].shape
    diff = np.abs(grid.astype(np.int32)
                  - latent_baseline["grid"].astype(np.int32))
    assert diff.max() <= 1, f"{mode}: eval grid diverged (max {diff.max()})"


@pytest.mark.parametrize("mode", MODES)
def test_manipulation_trainer_sharded_matches_replicated(
        artifacts, manip_baseline, tmp_path, mode):
    run = str(tmp_path / mode)
    tr = ManipulationTrainer(config=manip_cfg(artifacts, mode), run_path=run)

    # (b) frozen encoder/decoder sharded.  The classifier itself is a
    # (16, 5) kernel -- far below any shard threshold, and that is the
    # POINT of this stage's sharded modes: the frozen trees are the
    # memory, the trainable head is trivial.
    assert _sharded_leaves(tr.encoder_params)
    assert _sharded_leaves(tr.decoder_params)

    frozen_before = [np.asarray(l) for l in _leaves(tr.decoder_params)]
    tr.train(max_steps=4)
    for before, after in zip(frozen_before, _leaves(tr.decoder_params)):
        np.testing.assert_array_equal(before, np.asarray(after))

    # (a) BCE-loss equality with the replicated run
    losses = _losses(run, "bce_loss")
    assert losses and len(losses) == len(manip_baseline["losses"])
    np.testing.assert_allclose(losses, manip_baseline["losses"], rtol=1e-4)
    for a, b in zip(manip_baseline["params"], _leaves(tr.state.params)):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-3)

    # (c) manipulation eval: DDIM encode of the eval image through the
    # sharded frozen trees, then the manipulated decode
    tr.evaluate(4, encode_style="ddim5", decode_style="ddim5",
                class_id=2, scale=0.3)
    grid = _grid(run)
    assert grid.shape == manip_baseline["grid"].shape
    diff = np.abs(grid.astype(np.int32)
                  - manip_baseline["grid"].astype(np.int32))
    assert diff.max() <= 1, f"{mode}: eval grid diverged (max {diff.max()})"


# -- (d): sharded-checkpoint lifecycle for the latent stage --------------- #

def test_latent_fsdp_sharded_checkpoint_roundtrip(artifacts, tmp_path):
    run = str(tmp_path / "run")
    cfg = latent_cfg(artifacts, "fsdp",
                     extra={"checkpoint_format": "sharded"})
    tr = LatentDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=3)
    latest = os.path.join(run, "checkpoints", "latest.ckpt")
    from pdae_tpu.utils import is_sharded_checkpoint
    assert is_sharded_checkpoint(latest)

    tr2 = LatentDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 3
    for a, b in zip(_leaves(tr.state.params), _leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(_leaves(tr.state.ema_params),
                    _leaves(tr2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored leaves re-sharded, not replicated
    assert _sharded_leaves(tr2.state.params)

    # a sharded-format latent checkpoint also loads replicated (the
    # logical keys are mode- and format-independent)
    tr3 = LatentDiffusionTrainer(config=latent_cfg(artifacts), run_path=run,
                                 resume="latest")
    for a, b in zip(_leaves(tr.state.params), _leaves(tr3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -- TP x MLPSkipNet at flagship width, SPMD-guard-wrapped ---------------- #

def test_tp_flagship_mlp_skip_net_guarded_compile():
    """TP's documented sweet spot (PERF.md rule of thumb) is exactly this
    model: the latent MLPSkipNet's 2048-wide Dense stack.  Run the
    flagship width (512 -> 2048, depth truncated for CPU) fwd+bwd on a
    [data=4, model=2] mesh with channel-sharded kernels, compile under
    the SPMD-degradation guard (salted so the partition pass is always
    cold -- cache hits replay without warnings), and match the replicated
    loss+grads."""
    from pdae_tpu.models import MLPSkipNet
    from pdae_tpu.parallel import (MODEL_AXIS, make_tp_mesh, replicated,
                                   shard_tree_tp, spmd_degradation_check)

    m = MLPSkipNet(input_channel=512, model_channel=2048, num_layers=3,
                   time_emb_channel=64, use_norm=True, dropout=0.0)
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.standard_normal((16, 512)), jnp.float32)
    t = jnp.asarray(rs.randint(0, 1000, (16,)), jnp.int32)
    params = jax.jit(m.init)(init_key(0), z, t)["params"]

    def loss(p, zz, tt):
        return jnp.mean(m.apply({"params": p}, zz, tt) ** 2)

    ref_l, ref_g = jax.jit(jax.value_and_grad(loss))(params, z, t)
    ref_l = float(ref_l)

    mesh = make_tp_mesh(2)   # data 4 x model 2
    tparams = shard_tree_tp(mesh, params)
    wide = [l for l in _sharded_leaves(tparams) if l.ndim == 2
            and 2048 in l.shape]
    assert wide, "no 2048-wide Dense kernel was channel-sharded"
    for leaf in wide:
        assert MODEL_AXIS in {a for e in leaf.sharding.spec if e
                              for a in ((e,) if isinstance(e, str)
                                        else tuple(e))}
    zr = jax.device_put(z, jax.sharding.NamedSharding(mesh, P("data")))
    tr_ = jax.device_put(t, jax.sharding.NamedSharding(mesh, P("data")))

    salt = np.float32(int.from_bytes(os.urandom(3), "little"))

    def salted(p, zz, tt):
        l, g = jax.value_and_grad(loss)(p, zz, tt)
        return l + jnp.float32(salt) * 0.0, g

    with mesh:
        with spmd_degradation_check():
            l, g = jax.jit(salted)(tparams, zr, tr_)
            jax.block_until_ready(l)
    np.testing.assert_allclose(float(l), ref_l, rtol=1e-5)
    for a, b in zip(_leaves(ref_g), _leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


# -- SP x manipulation: the 128px-conv-encoder stage IS SP's regime ------- #

def _sp_opts(mode):
    opts = {"param_sharding": mode, "sp_size": 2, "fsdp_min_size": 256}
    return opts


@pytest.mark.parametrize("mode", ["sp", "fsdp+sp"])
def test_manipulation_trainer_sp_matches_replicated(
        artifacts, manip_baseline, tmp_path, mode):
    """Verdict r4 #5: the manipulation stage runs a conv encoder over
    images -- exactly spatial parallelism's documented regime -- but no
    sp/fsdp+sp cell existed for stages 3-4.  (The LATENT stage is the
    documented N/A: MLPSkipNet has no spatial dims to shard -- see
    PARITY.md.)  Assertions: the compiled train step halo-exchanges the
    H-sharded encoder convs; fsdp+sp additionally shards the frozen
    trees over 'data'; loss stream + eval grid equal the replicated
    run."""
    run = str(tmp_path / mode.replace("+", "_"))
    tr = ManipulationTrainer(
        config=manip_cfg(artifacts, extra=_sp_opts(mode)), run_path=run)

    assert set(tr.mesh.axis_names) == {"data", "sp"}
    if mode == "fsdp+sp":
        # frozen encoder/decoder FSDP-shard over 'data'
        assert _sharded_leaves(tr.encoder_params), \
            "fsdp+sp: frozen encoder not sharded"
        assert _sharded_leaves(tr.decoder_params)
    else:
        # pure sp replicates params; activations shard instead
        assert not _sharded_leaves(tr.encoder_params)

    tr.train(max_steps=4)

    # (a) BCE-loss equality with the replicated baseline
    losses = _losses(run, "bce_loss")
    assert losses and len(losses) == len(manip_baseline["losses"])
    np.testing.assert_allclose(losses, manip_baseline["losses"], rtol=1e-4)
    for a, b in zip(manip_baseline["params"], _leaves(tr.state.params)):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-3)

    # structural proof: the jitted step's HLO carries halo
    # collective-permutes (GSPMD kept the encoder activations H-sharded;
    # loss equality alone would also pass under silent replication).
    # Lower on a loader batch AFTER training so the baseline's batch
    # stream is untouched.
    hb = next(tr.loader.infinite())
    db = {k: jax.device_put(np.asarray(v), tr.batch_sharding)
          for k, v in hb.items()}
    with tr.mesh:   # constrain_spatial hints only bind inside the mesh
        txt = tr._train_step.lower(tr.state, tr.encoder_params, db
                                   ).compile().as_text()
    assert "collective-permute" in txt, \
        f"{mode}: manipulation step compiled without halo exchange"

    # (c) eval executes under the sp mesh and reproduces the grid
    tr.evaluate(4, encode_style="ddim5", decode_style="ddim5",
                class_id=2, scale=0.3)
    grid = _grid(run)
    assert grid.shape == manip_baseline["grid"].shape
    diff = np.abs(grid.astype(np.int32)
                  - manip_baseline["grid"].astype(np.int32))
    assert diff.max() <= 1, f"{mode}: eval grid diverged (max {diff.max()})"
