"""Batch-transfer diet: step-key filtering + uint8 x_0 transfer.

The REAL train loop on a transfer-limited host is bound by host->device
batch bytes (PERF.md "The REAL stage-3 loop" / "Batch-transfer diet").
Two levers, both tested here:

* key filtering: the iterators drop batch keys the jitted step never
  reads (``gts``/``idx``/...) BEFORE transfer -- must be a pure no-op on
  the training trajectory (same stream, same programs, bitwise-equal
  states);
* ``transfer_uint8``: datasets emit x_0 as raw uint8 and the step
  normalizes on device with the exact host fp32 op sequence
  (``utils.x0_from_transfer``) -- bitwise-identical for image-born
  (uint8) data, so turning it on changes NOTHING but the bytes moved.

Reference counterpart being beaten: the torch loaders always ship float32
x_0 plus the gt tensor to the GPU (dataset/celeba64.py collate).
"""

import copy

import jax
import numpy as np
import pytest

from pdae_tpu.data.datasets import _finalize
from pdae_tpu.training import RegularDiffusionTrainer
from pdae_tpu.utils import x0_from_transfer

from test_training_regular import TINY_CONFIG


@pytest.mark.quick
def test_x0_from_transfer_bitwise_matches_host_path():
    """Device normalize of uint8 == host float path, bit for bit."""
    rs = np.random.RandomState(0)
    arr = rs.randint(0, 256, (5, 16, 16, 3), np.uint8)
    host = arr.astype(np.float32) / 255.0 * 2.0 - 1.0   # _finalize's math
    dev = np.asarray(x0_from_transfer(arr))
    assert dev.dtype == np.float32
    np.testing.assert_array_equal(dev, host)
    # float input: exact identity (no double normalization)
    np.testing.assert_array_equal(np.asarray(x0_from_transfer(host)), host)


@pytest.mark.quick
def test_finalize_uint8_mode_consistent_with_float_mode():
    """Same PIL input + same rng state -> the uint8-mode pixels reproduce
    the float-mode x_0 exactly (including the hflip decision), and gt is
    identical in both modes."""
    from PIL import Image
    rs = np.random.RandomState(7)
    img = Image.fromarray(rs.randint(0, 256, (16, 16, 3), np.uint8))
    for seed in range(4):   # covers both flip outcomes
        x_f, gt_f = _finalize(img, np.random.default_rng(seed), True)
        x_u, gt_u = _finalize(img, np.random.default_rng(seed), True,
                              as_uint8=True)
        assert x_u.dtype == np.uint8
        np.testing.assert_array_equal(gt_u, gt_f)
        np.testing.assert_array_equal(np.asarray(x0_from_transfer(x_u)), x_f)
        np.testing.assert_array_equal(x_u, gt_f)  # gt IS the raw pixels


@pytest.mark.quick
def test_step_batch_key_declarations():
    from pdae_tpu.training.latent import LatentDiffusionTrainer
    from pdae_tpu.training.manipulation import ManipulationTrainer
    from pdae_tpu.training.representation import RepresentationLearningTrainer
    assert RepresentationLearningTrainer._step_batch_keys(None) == ("x_0",)
    assert LatentDiffusionTrainer._step_batch_keys(None) == ("x_0",)
    assert ManipulationTrainer._step_batch_keys(None) == ("x_0", "label")


def test_filter_is_trajectory_noop_and_drops_dead_keys(tmp_path):
    """Filtered vs unfiltered: identical batch stream into the SAME jitted
    program -> bitwise-equal params; and the filtered stream carries only
    the declared keys."""
    cfg = copy.deepcopy(TINY_CONFIG)
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "f"))
    batch = next(tr._batch_iterator(0))
    assert set(batch) == {"x_0"}          # gts/idx/label/condition dropped

    ctl = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "c"))
    ctl._step_batch_keys = lambda: None   # pre-diet behavior
    full = next(ctl._batch_iterator(0))
    assert {"x_0", "gts", "idx"} <= set(full)

    tr.train(max_steps=4, save_on_exit=False)
    ctl.train(max_steps=4, save_on_exit=False)
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(ctl.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conditional_filter_keeps_condition(tmp_path):
    cfg = {**copy.deepcopy(TINY_CONFIG),
           "denoise_fn_config": {**TINY_CONFIG["denoise_fn_config"],
                                 "num_class": 10}}
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "run"))
    batch = next(tr._batch_iterator(0))
    assert set(batch) == {"x_0", "condition"}
    tr.train(max_steps=2, save_on_exit=False)
    assert int(tr.state.step) == 2


def test_transfer_uint8_end_to_end(tmp_path):
    """transfer_uint8 synthetic batches reach the step as uint8 and train;
    with steps_per_dispatch the chunked iterator carries the same dtype."""
    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["train_dataset_config"]["transfer_uint8"] = True
    tr = RegularDiffusionTrainer(config=cfg, run_path=str(tmp_path / "u8"))
    batch = next(tr._batch_iterator(0))
    assert batch["x_0"].dtype == np.uint8   # 4x fewer bytes transferred
    tr.train(max_steps=4, save_on_exit=False)
    assert int(tr.state.step) == 4

    cfg2 = copy.deepcopy(cfg)
    cfg2["runner_config"]["steps_per_dispatch"] = 2
    cfg2["runner_config"]["display_steps"] = 2
    cfg2["runner_config"]["save_latest_every_steps"] = 4
    tr2 = RegularDiffusionTrainer(config=cfg2, run_path=str(tmp_path / "k2"))
    chunk = next(tr2._chunked_batch_iterator(0, 2, 4))
    assert chunk["x_0"].dtype == np.uint8 and chunk["x_0"].shape[0] == 2
    tr2.train(max_steps=4, save_on_exit=False)
    assert int(tr2.state.step) == 4
