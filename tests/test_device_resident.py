"""Device-resident training data (``train_dataset_config.device_resident``):
the corpus lives in HBM and every minibatch is gathered ON DEVICE from
indices drawn inside the jitted K-step program -- zero per-step
host->device transfer (training/resident.py; reference counterpart being
replaced: the host DataLoader loop at
``/root/reference/trainer/train_latent_diffusion.py:95-130``).

Contract under test:
(a) the gather/flip math of ``sample_batch`` (unit),
(b) materialization matches the dataset's own collated items,
(c) the index stream is a pure function of (seed, step): K=1 and K=4
    trajectories agree, identical runs are bitwise identical,
(d) resume from an arbitrary (misaligned) checkpoint step reproduces the
    uninterrupted run,
(e) all four trainer families run resident (latent, manipulation with
    multilabel gathers, regular with device-side hflip),
(f) resident composes with sharded placement (fsdp loss equality).
"""

import copy
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdae_tpu.training import (LatentDiffusionTrainer, ManipulationTrainer,
                               RegularDiffusionTrainer)
from pdae_tpu.training.resident import (DATA_STREAM_TAG,
                                        materialize_step_arrays,
                                        sample_batch)

from test_training_regular import TINY_CONFIG

pytestmark = pytest.mark.quick


def _leaves(t):
    return jax.tree_util.tree_leaves(t)


def _losses(run, key="prediction_loss"):
    with open(os.path.join(run, "metrics.jsonl")) as f:
        return [json.loads(l)[key] for l in f]


# -- (a) unit: gather + flip ------------------------------------------------ #

def test_sample_batch_gather_matches_take():
    data = {"x_0": jnp.arange(7 * 4 * 4 * 1, dtype=jnp.float32)
                      .reshape(7, 4, 4, 1),
            "label": jnp.arange(7, dtype=jnp.int32)}
    key = jax.random.fold_in(jax.random.PRNGKey(3), DATA_STREAM_TAG)
    out = sample_batch(data, key, batch_size=5, n=7)
    # pin the rng contract: split -> randint on the first subkey
    ikey, _ = jax.random.split(key)
    idx = jax.random.randint(ikey, (5,), 0, 7)
    np.testing.assert_array_equal(np.asarray(out["label"]),
                                  np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out["x_0"]),
                                  np.asarray(jnp.take(data["x_0"], idx,
                                                      axis=0)))


def test_sample_batch_flip_rows():
    x = jnp.arange(6 * 2 * 3 * 1, dtype=jnp.float32).reshape(6, 2, 3, 1)
    key = jax.random.PRNGKey(11)
    out = sample_batch({"x_0": x}, key, batch_size=6, n=6, flip=True)
    ikey, fkey = jax.random.split(key)
    idx = np.asarray(jax.random.randint(ikey, (6,), 0, 6))
    coin = np.asarray(jax.random.bernoulli(fkey, 0.5, (6,)))
    rows = np.asarray(x)[idx]
    want = np.where(coin[:, None, None, None], rows[:, :, ::-1, :], rows)
    np.testing.assert_array_equal(np.asarray(out["x_0"]), want)
    assert coin.any() and not coin.all(), "flip coin degenerate for seed 11"


# -- (b) materialization ---------------------------------------------------- #

def test_materialize_matches_items():
    from pdae_tpu.data import build_dataset
    ds = build_dataset({"name": "SYNTHETIC", "image_size": 16,
                        "image_channel": 1, "length": 10})
    arrs = materialize_step_arrays(ds, ("x_0", "label"), chunk=4)
    assert set(arrs) == {"x_0", "label"} and len(arrs["x_0"]) == 10
    for i in (0, 3, 9):
        np.testing.assert_array_equal(arrs["x_0"][i], ds[i]["x_0"])
        assert arrs["label"][i] == ds[i]["label"]


def test_materialize_respects_transfer_uint8():
    from pdae_tpu.data import build_dataset
    ds = build_dataset({"name": "SYNTHETIC", "image_size": 16,
                        "image_channel": 1, "length": 6,
                        "transfer_uint8": True})
    arrs = materialize_step_arrays(ds, ("x_0",))
    assert arrs["x_0"].dtype == np.uint8


# -- stage-3/4 fixtures (shared builders) ----------------------------------- #

@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    from test_stage34_sharded import build_stage34_artifacts, \
        patch_tiny_encoders
    mp = pytest.MonkeyPatch()
    patch_tiny_encoders(mp)
    root = tmp_path_factory.mktemp("resident34")
    build_stage34_artifacts(root)
    yield root
    mp.undo()


def _latent_cfg(root, k=1, mode=None, resident=True, sampling=None,
                **extra):
    from test_stage34_sharded import latent_cfg
    cfg = latent_cfg(root, mode=mode,
                     extra={"steps_per_dispatch": k,
                            "display_steps": 4,
                            "evaluate_every_steps": 4 * 10 ** 5,
                            "save_latest_every_steps": 4 * 10 ** 5,
                            "save_checkpoint_every_steps": 4 * 10 ** 5,
                            **extra})
    cfg["train_dataset_config"]["device_resident"] = resident
    if sampling:
        cfg["train_dataset_config"]["resident_sampling"] = sampling
    return cfg


# -- (c) trajectory identity across K --------------------------------------- #

def test_latent_resident_k1_equals_k4(artifacts, tmp_path):
    """Resident indices are keyed by state.step alone, so K=1 and K=4 run
    the SAME data/noise trajectory (the host path only guarantees the
    same stream; here even chunking can't change it).  Params agree to
    program-reduction-order tolerance, loss windows tightly."""
    t1 = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=1),
                                run_path=str(tmp_path / "s"))
    t4 = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=4),
                                run_path=str(tmp_path / "m"))
    t1.train(max_steps=8)
    t4.train(max_steps=8)
    assert int(t1.state.step) == int(t4.state.step) == 8
    for a, b in zip(_leaves(t1.state.params), _leaves(t4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    np.testing.assert_allclose(_losses(str(tmp_path / "s")),
                               _losses(str(tmp_path / "m")), rtol=1e-4)


def test_latent_resident_identical_runs_bitwise(artifacts, tmp_path):
    """uniform mode: zero per-step host bytes, bitwise-deterministic."""
    a = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=2, sampling="uniform"),
        run_path=str(tmp_path / "a"))
    b = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=2, sampling="uniform"),
        run_path=str(tmp_path / "b"))
    a.train(max_steps=4)
    b.train(max_steps=4)
    for x, y in zip(_leaves(a.state.params), _leaves(b.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# -- epoch mode: the host loader's exact stream ------------------------------ #

def test_epoch_indices_match_host_loader():
    """epoch_global_indices must reproduce the host loader's batches
    bitwise -- compared against the loader's own collated 'idx' keys."""
    from pdae_tpu.data import Loader, build_dataset
    from pdae_tpu.training.resident import epoch_global_indices
    ds = build_dataset({"name": "SYNTHETIC", "image_size": 16,
                        "image_channel": 1, "length": 37})
    loader = Loader(ds, batch_size=8, shuffle=True, seed=5, num_workers=1)
    for epoch in (0, 1, 3):
        table = epoch_global_indices(loader, epoch)
        assert table.shape == (loader.batches_per_epoch(), 8)
        for row, batch in zip(table, loader.epoch(epoch)):
            np.testing.assert_array_equal(row, batch["idx"])


def test_epoch_resident_matches_host_loader_training(artifacts, tmp_path):
    """THE equivalence: resident 'epoch' training consumes bitwise the
    batches the host-loader path would (non-augmented float corpus), so
    the two loops produce the same loss stream and the same params up to
    program-level reduction order."""
    host = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=1, resident=False),
        run_path=str(tmp_path / "host"))
    res = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=1, sampling="epoch"),
        run_path=str(tmp_path / "res"))
    host.train(max_steps=8)
    res.train(max_steps=8)
    np.testing.assert_allclose(_losses(str(tmp_path / "host")),
                               _losses(str(tmp_path / "res")), rtol=1e-6)
    for a, b in zip(_leaves(host.state.params), _leaves(res.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# -- (d) misaligned resume --------------------------------------------------- #

def test_latent_resident_misaligned_resume(artifacts, tmp_path):
    straight = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=1),
                                      run_path=str(tmp_path / "a"))
    straight.train(max_steps=9)

    run = str(tmp_path / "b")
    t1 = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=4),
                                run_path=run)
    t1.train(max_steps=5)           # chunks 4 + 1(tail), ckpt at step 5
    t2 = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=4),
                                run_path=run, resume="latest")
    assert t2.start_step == 5
    t2.train(max_steps=9)           # chunks 3(realign) + 1(tail)
    for a, b in zip(_leaves(straight.state.params), _leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


# -- (e) other trainer families ---------------------------------------------- #

def test_manipulation_resident_trains(artifacts, tmp_path):
    from test_stage34_sharded import manip_cfg
    cfg = manip_cfg(artifacts,
                    extra={"steps_per_dispatch": 3, "display_steps": 3,
                           "evaluate_every_steps": 3 * 10 ** 5,
                           "save_latest_every_steps": 3 * 10 ** 5,
                           "save_checkpoint_every_steps": 3 * 10 ** 5})
    cfg["train_dataset_config"]["device_resident"] = True
    tr = ManipulationTrainer(config=cfg, run_path=str(tmp_path / "r"))
    tr.train(max_steps=6)
    assert int(tr.state.step) == 6
    ls = _losses(str(tmp_path / "r"), key="bce_loss")
    assert len(ls) == 2 and all(np.isfinite(ls))


def test_regular_resident_with_device_flip(tmp_path):
    """Regular trainer resident, with the dataset flagged for
    augmentation: the device-side hflip path compiles and trains."""
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["train_dataset_config"]["device_resident"] = True
    cfg["runner_config"].update({"steps_per_dispatch": 2,
                                 "display_steps": 2,
                                 "save_latest_every_steps": 10 ** 6})
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "r"))
    tr.train_dataset.augmentation = True   # SYNTHETIC has no host aug
    tr.train(max_steps=4)
    assert int(tr.state.step) == 4
    ls = _losses(str(tmp_path / "r"))
    assert len(ls) == 2 and all(np.isfinite(ls))


# -- (f) sharded placement --------------------------------------------------- #

def test_latent_resident_fsdp_loss_equality(artifacts, tmp_path):
    """Resident indices are global (same on every chip) and the gather is
    partitioned by the index sharding constraint; fsdp placement must see
    the identical data stream -> identical loss windows."""
    rep = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=2),
                                 run_path=str(tmp_path / "rep"))
    fsdp = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=2, mode="fsdp"),
        run_path=str(tmp_path / "fsdp"))
    rep.train(max_steps=4)
    fsdp.train(max_steps=4)
    np.testing.assert_allclose(_losses(str(tmp_path / "rep")),
                               _losses(str(tmp_path / "fsdp")), rtol=1e-4)


def test_resident_cadences_eval_save_resume(artifacts, tmp_path):
    """Resident loop with LIVE eval/save cadences: the index-chunk stream
    pauses across boundary work (eval grids, checkpoint writes) and a
    checkpoint resume realigns mid-epoch."""
    run = str(tmp_path / "r")
    cfg = _latent_cfg(artifacts, k=2, display_steps=4,
                      evaluate_every_steps=4,
                      save_latest_every_steps=4)
    tr = LatentDiffusionTrainer(config=cfg, run_path=run)
    tr.train(max_steps=6)
    assert os.path.exists(os.path.join(run, "checkpoints", "latest.ckpt"))
    assert any(f.endswith(".png")
               for f in os.listdir(os.path.join(run, "samples")))
    tr2 = LatentDiffusionTrainer(config=cfg, run_path=run, resume="latest")
    assert tr2.start_step == 6
    tr2.train(max_steps=10)
    assert int(tr2.state.step) == 10


# -- precomputed-z training source (stages 3-4) ------------------------------ #

def test_precomputed_z_matches_encode_mode_latent(artifacts, tmp_path):
    """latent_train_source 'precomputed': encoding the corpus once and
    gathering z must train identically to encoding every step (the
    encoder is per-sample GroupNorm-normalized, so z is deterministic
    and batch-composition-independent)."""
    enc = LatentDiffusionTrainer(config=_latent_cfg(artifacts, k=2),
                                 run_path=str(tmp_path / "enc"))
    pre = LatentDiffusionTrainer(
        config=_latent_cfg(artifacts, k=2,
                           latent_train_source="precomputed"),
        run_path=str(tmp_path / "pre"))
    enc.train(max_steps=8)
    pre.train(max_steps=8)
    np.testing.assert_allclose(_losses(str(tmp_path / "enc")),
                               _losses(str(tmp_path / "pre")), rtol=1e-5)
    for a, b in zip(_leaves(enc.state.params), _leaves(pre.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_precomputed_z_matches_encode_mode_manipulation(artifacts, tmp_path):
    from test_stage34_sharded import manip_cfg

    def cfg(source):
        c = manip_cfg(artifacts,
                      extra={"steps_per_dispatch": 2, "display_steps": 4,
                             "evaluate_every_steps": 4 * 10 ** 5,
                             "save_latest_every_steps": 4 * 10 ** 5,
                             "save_checkpoint_every_steps": 4 * 10 ** 5,
                             "latent_train_source": source})
        c["train_dataset_config"]["device_resident"] = True
        return c

    enc = ManipulationTrainer(config=cfg("encode"),
                              run_path=str(tmp_path / "enc"))
    pre = ManipulationTrainer(config=cfg("precomputed"),
                              run_path=str(tmp_path / "pre"))
    enc.train(max_steps=8)
    pre.train(max_steps=8)
    np.testing.assert_allclose(_losses(str(tmp_path / "enc"), "bce_loss"),
                               _losses(str(tmp_path / "pre"), "bce_loss"),
                               rtol=1e-5)


def test_precomputed_requires_resident(artifacts, tmp_path):
    with pytest.raises(ValueError, match="device_resident"):
        LatentDiffusionTrainer(
            config=_latent_cfg(artifacts, k=1, resident=False,
                               latent_train_source="precomputed"),
            run_path=str(tmp_path / "r"))


def test_encode_corpus_ragged_tail():
    """encode_corpus pads the ragged tail chunk and slices it back --
    outputs must equal a single-shot encode."""
    import flax.linen as nn
    from pdae_tpu.training.resident import encode_corpus

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x.reshape(x.shape[0], -1))

    m = Tiny()
    x = np.random.RandomState(0).rand(11, 2, 2, 1).astype(np.float32)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(encode_corpus(m, p, x, chunk=4))
    want = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
