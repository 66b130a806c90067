"""Dispatch-amortized training: ``runner_config.steps_per_dispatch: K``
scans K train steps inside one XLA program (removes the per-step host
dispatch gap, PERF.md).  Must consume the identical batch/RNG stream as
the single-step loop -- trajectories match and bitwise-deterministic
resume survives arbitrary (misaligned) checkpoint steps.
"""

import copy
import os

import jax
import numpy as np
import pytest

from pdae_tpu.training import RegularDiffusionTrainer
from pdae_tpu.training.base import BaseTrainer

from test_training_regular import TINY_CONFIG


def _cfg(k, **runner):
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["runner_config"]["steps_per_dispatch"] = k
    cfg["runner_config"]["save_latest_every_steps"] = 10 ** 6
    cfg["runner_config"].update(runner)
    return cfg


def _leaves(t):
    return jax.tree_util.tree_leaves(t)


def test_chunk_schedule():
    sched = list(BaseTrainer._chunk_schedule(0, 4, 10))
    assert sched == [4, 4, 2]
    # misaligned resume: realign to multiples of k first
    assert list(BaseTrainer._chunk_schedule(5, 4, 13)) == [3, 4, 1]
    assert list(BaseTrainer._chunk_schedule(3, 4, 3)) == []
    gen = BaseTrainer._chunk_schedule(2, 4, None)   # infinite
    assert [next(gen) for _ in range(3)] == [2, 4, 4]


def test_multi_step_matches_single(tmp_path):
    """Same batch/RNG stream, same trajectory.  The scanned program is a
    different XLA compilation of the same math, so params carry
    reduction-order noise amplified by adam (~1e-5/step, like the FSDP
    equivalence test); the per-window LOSS stream must agree tightly."""
    cfg1 = _cfg(1, display_steps=4)
    cfg4 = _cfg(4, display_steps=4)
    tr1 = RegularDiffusionTrainer(config=cfg1, run_path=str(tmp_path / "s"))
    tr4 = RegularDiffusionTrainer(config=cfg4, run_path=str(tmp_path / "m"))
    tr1.train(max_steps=8)
    tr4.train(max_steps=8)
    assert int(tr4.state.step) == 8
    for a, b in zip(_leaves(tr1.state.params), _leaves(tr4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    l1, l4 = losses(str(tmp_path / "s")), losses(str(tmp_path / "m"))
    assert len(l1) == len(l4) == 2
    np.testing.assert_allclose(l1, l4, rtol=1e-4)


def test_multi_step_tail_and_misaligned_resume(tmp_path):
    """Interrupt at a step that is NOT a multiple of K, resume, finish:
    identical to the straight run (realignment chunk + tail chunk)."""
    straight = RegularDiffusionTrainer(config=_cfg(1),
                                       run_path=str(tmp_path / "a"))
    straight.train(max_steps=9)

    run = str(tmp_path / "b")
    t1 = RegularDiffusionTrainer(config=_cfg(4, display_steps=4),
                                 run_path=run)
    t1.train(max_steps=5)           # chunks 4 + 1(tail), ckpt at step 5
    t2 = RegularDiffusionTrainer(config=_cfg(4, display_steps=4),
                                 run_path=run, resume="latest")
    assert t2.start_step == 5
    t2.train(max_steps=9)           # chunks 3(realign) + 1(tail)
    for a, b in zip(_leaves(straight.state.params), _leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_cadence_validation(tmp_path):
    cfg = _cfg(4, display_steps=3)
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "r"))
    with pytest.raises(ValueError, match="multiple of steps_per_dispatch"):
        tr.train(max_steps=8)


def test_multi_step_representation_trainer(tmp_path, monkeypatch):
    """PDAE stage (frozen params as extra scan args -- not baked-in
    constants) trains under K=3 and matches K=1."""
    import jax.numpy as jnp

    import pdae_tpu.training.representation as rep
    from pdae_tpu.models.encoder import SemanticEncoder
    from pdae_tpu.training import RepresentationLearningTrainer

    def tiny_encoder(config, image_size=None, dtype=jnp.float32):
        return SemanticEncoder(config["latent_dim"], channels=(8, 16),
                               attn_after_stage=2, dtype=dtype)

    monkeypatch.setattr(rep, "build_encoder", tiny_encoder)

    base = copy.deepcopy(TINY_CONFIG)

    def pdae_cfg(k):
        return {
            "train_dataset_config": {**base["train_dataset_config"],
                                     "latent_dim": 16},
            "eval_dataset_config": {},
            "diffusion_config": base["diffusion_config"],
            "trained_ddpm_config": {
                "denoise_fn_config": base["denoise_fn_config"]},
            "encoder_config": {"model": "CELEBA64Encoder", "latent_dim": 16},
            "decoder_config": {"model": "ShiftUNet", "latent_dim": 16},
            "dataloader_config": base["dataloader_config"],
            "optimizer_config": base["optimizer_config"],
            "runner_config": {**base["runner_config"],
                              "steps_per_dispatch": k,
                              "display_steps": 3,
                              "evaluate_every_steps": 3 * 10 ** 5,
                              "save_checkpoint_every_steps": 3 * 10 ** 5,
                              "save_latest_every_steps": 3 * 10 ** 5},
        }

    t1 = RepresentationLearningTrainer(config=pdae_cfg(1),
                                       run_path=str(tmp_path / "s"))
    t3 = RepresentationLearningTrainer(config=pdae_cfg(3),
                                       run_path=str(tmp_path / "m"))
    t1.train(max_steps=6)
    t3.train(max_steps=6)
    for a, b in zip(_leaves(t1.state.params), _leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    np.testing.assert_allclose(losses(str(tmp_path / "s")),
                               losses(str(tmp_path / "m")), rtol=1e-4)


@pytest.fixture(scope="module")
def stage34_artifacts(tmp_path_factory):
    """Stage-2 artifact + tiny-encoder patch for the stage-3/4 trainers
    (shared builders in test_stage34_sharded)."""
    from test_stage34_sharded import build_stage34_artifacts, \
        patch_tiny_encoders
    mp = pytest.MonkeyPatch()
    patch_tiny_encoders(mp)
    root = tmp_path_factory.mktemp("spd34")
    build_stage34_artifacts(root)
    yield root
    mp.undo()


def test_multi_step_latent_trainer(stage34_artifacts, tmp_path):
    """Stage 3 under steps_per_dispatch: the latent step is ~4 ms of
    device time vs ~25 ms of tunnel dispatch on the real chip -- THE
    dispatch-bound stage (VERDICT r4 #3).  K=3 must consume the identical
    batch/RNG stream as K=1: loss stream + params match."""
    from test_stage34_sharded import latent_cfg
    from pdae_tpu.training import LatentDiffusionTrainer

    def cfg(k):
        return latent_cfg(stage34_artifacts,
                          extra={"steps_per_dispatch": k,
                                 "display_steps": 3,
                                 "evaluate_every_steps": 3 * 10 ** 5,
                                 "save_latest_every_steps": 3 * 10 ** 5,
                                 "save_checkpoint_every_steps": 3 * 10 ** 5})

    t1 = LatentDiffusionTrainer(config=cfg(1), run_path=str(tmp_path / "s"))
    t3 = LatentDiffusionTrainer(config=cfg(3), run_path=str(tmp_path / "m"))
    t1.train(max_steps=6)
    t3.train(max_steps=6)
    assert int(t3.state.step) == 6
    for a, b in zip(_leaves(t1.state.params), _leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["prediction_loss"] for l in f]
    l1, l3 = losses(str(tmp_path / "s")), losses(str(tmp_path / "m"))
    assert len(l1) == len(l3) == 2
    np.testing.assert_allclose(l1, l3, rtol=1e-4)


def test_multi_step_latent_misaligned_resume(stage34_artifacts, tmp_path):
    """Interrupt the K=4 latent run at step 5 (not a multiple of K),
    resume, finish at 9: identical to the straight K=1 run."""
    from test_stage34_sharded import latent_cfg
    from pdae_tpu.training import LatentDiffusionTrainer

    def cfg(k):
        return latent_cfg(stage34_artifacts,
                          extra={"steps_per_dispatch": k,
                                 "display_steps": 4 if k > 1 else 2,
                                 "evaluate_every_steps": 4 * 10 ** 5,
                                 "save_latest_every_steps": 10 ** 6,
                                 "save_checkpoint_every_steps": 4 * 10 ** 5})

    straight = LatentDiffusionTrainer(config=cfg(1),
                                      run_path=str(tmp_path / "a"))
    straight.train(max_steps=9)

    run = str(tmp_path / "b")
    t1 = LatentDiffusionTrainer(config=cfg(4), run_path=run)
    t1.train(max_steps=5)           # chunks 4 + 1(tail), ckpt at step 5
    t2 = LatentDiffusionTrainer(config=cfg(4), run_path=run,
                                resume="latest")
    assert t2.start_step == 5
    t2.train(max_steps=9)           # chunks 3(realign) + 1(tail)
    for a, b in zip(_leaves(straight.state.params), _leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_multi_step_latent_cadence_validation(stage34_artifacts, tmp_path):
    from test_stage34_sharded import latent_cfg
    from pdae_tpu.training import LatentDiffusionTrainer
    cfg = latent_cfg(stage34_artifacts,
                     extra={"steps_per_dispatch": 4,
                            "display_steps": 3,
                            "evaluate_every_steps": 4 * 10 ** 5,
                            "save_latest_every_steps": 4 * 10 ** 5,
                            "save_checkpoint_every_steps": 4 * 10 ** 5})
    tr = LatentDiffusionTrainer(config=cfg, run_path=str(tmp_path / "r"))
    with pytest.raises(ValueError, match="multiple of steps_per_dispatch"):
        tr.train(max_steps=8)


def test_multi_step_manipulation_trainer(stage34_artifacts, tmp_path):
    """Stage 4 under steps_per_dispatch (multilabel batches stack through
    the chunked iterator): K=3 matches K=1 on the BCE stream + params."""
    from test_stage34_sharded import manip_cfg
    from pdae_tpu.training import ManipulationTrainer

    def cfg(k):
        return manip_cfg(stage34_artifacts,
                         extra={"steps_per_dispatch": k,
                                "display_steps": 3,
                                "evaluate_every_steps": 3 * 10 ** 5,
                                "save_latest_every_steps": 3 * 10 ** 5,
                                "save_checkpoint_every_steps": 3 * 10 ** 5})

    t1 = ManipulationTrainer(config=cfg(1), run_path=str(tmp_path / "s"))
    t3 = ManipulationTrainer(config=cfg(3), run_path=str(tmp_path / "m"))
    t1.train(max_steps=6)
    t3.train(max_steps=6)
    assert int(t3.state.step) == 6
    for a, b in zip(_leaves(t1.state.params), _leaves(t3.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    import json
    def losses(run):
        with open(os.path.join(run, "metrics.jsonl")) as f:
            return [json.loads(l)["bce_loss"] for l in f]
    np.testing.assert_allclose(losses(str(tmp_path / "s")),
                               losses(str(tmp_path / "m")), rtol=1e-4)


def test_multi_step_with_grad_accumulation(tmp_path):
    """steps_per_dispatch composes with num_iterations (micro-batch scan
    inside each scanned step): loss finite, step count exact."""
    cfg = _cfg(2, display_steps=4)
    cfg["runner_config"]["num_iterations"] = 2   # micro-batch 4 x 2
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "r"))
    tr.train(max_steps=6)
    assert int(tr.state.step) == 6
    import json
    with open(os.path.join(str(tmp_path / "r"), "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert rows and all(np.isfinite(r["prediction_loss"]) for r in rows)
