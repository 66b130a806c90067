"""MNIST end-to-end recipe validation on synthetic idx files.

The env has no network egress, so scripts/mnist_e2e.sh can't fetch the real
idx files here; this test writes byte-exact synthetic idx(.gz) files
(magic 2051/2049, big-endian headers) and drives the recipe's exact
pipeline: MNIST dataset load -> RegularDiffusionTrainer (conditional UNet,
one-hot collate) -> checkpoint -> TestDPMs sampler grid from the saved run
(reference flow: config/mnist_regular.yml + sampler/test_dpms.py).
"""

import gzip
import os
import struct

import numpy as np
import pytest

from pdae_tpu.data import build_dataset
from pdae_tpu.sampling.samplers import SAMPLERS
from pdae_tpu.training.regular import RegularDiffusionTrainer
from pdae_tpu.utils import load_yaml

N_TRAIN, N_TEST = 64, 16


def write_idx(dir_, prefix, n, seed, compress):
    rs = np.random.RandomState(seed)
    images = rs.randint(0, 256, (n, 28, 28), np.uint8)
    labels = rs.randint(0, 10, (n,), np.uint8)
    op = (lambda p: gzip.open(p, "wb")) if compress else (
        lambda p: open(p, "wb"))
    suffix = ".gz" if compress else ""
    with op(os.path.join(dir_, f"{prefix}-images-idx3-ubyte{suffix}")) as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(images.tobytes())
    with op(os.path.join(dir_, f"{prefix}-labels-idx1-ubyte{suffix}")) as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(labels.tobytes())
    return images, labels


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mnist"))
    write_idx(d, "train", N_TRAIN, seed=0, compress=True)   # gz path
    write_idx(d, "t10k", N_TEST, seed=1, compress=False)    # raw path
    return d


def test_idx_loading_both_formats(mnist_dir):
    train = build_dataset({"name": "MNIST", "data_path": mnist_dir,
                           "image_size": 32, "image_channel": 1,
                           "train": True})
    test = build_dataset({"name": "MNIST", "data_path": mnist_dir,
                          "image_size": 32, "image_channel": 1,
                          "train": False})
    assert len(train) == N_TRAIN and len(test) == N_TEST
    item = train[0]
    assert item["x_0"].shape == (32, 32, 1)
    batch = type(train).collate_fn([train[i] for i in range(4)])
    assert batch["condition_onehot"].shape == (4, 10)
    assert (batch["condition_onehot"].sum(axis=1) == 1).all()


def test_mnist_recipe_end_to_end(mnist_dir, tmp_path):
    """scripts/mnist_e2e.sh's pipeline with a CPU-sized model."""
    config = load_yaml(os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))),
        "configs", "mnist_regular.yml"))
    # real config, scaled down for 2 CPU train steps
    config["train_dataset_config"]["data_path"] = mnist_dir
    # unconditional, like the reference's committed config (its num_class
    # line ships commented out, config/mnist_regular.yml:16); conditional
    # UNet forward parity is covered by test_models.py
    config["denoise_fn_config"].update(
        base_channel=16, channel_multiplier=[1, 2],
        num_residual_blocks_of_a_block=1)
    config["dataloader_config"]["train"].update(batch_size=8, num_workers=2)
    # shrunk cadences must carry K=1 (shipped configs default
    # steps_per_dispatch: 4, which has to divide every cadence)
    config["runner_config"].update(display_steps=1, evaluate_every_steps=100,
                                   save_latest_every_steps=100,
                                   steps_per_dispatch=1)

    run = str(tmp_path / "run")
    trainer = RegularDiffusionTrainer(config=config, run_path=run)
    trainer.train(max_steps=2)

    assert os.path.exists(os.path.join(run, "checkpoints", "latest.ckpt"))
    assert os.path.exists(os.path.join(run, "config.yml"))

    sampler_cfg = {
        "diffusion_config": {"timesteps": 1000, "betas_type": "linear"},
        "config_path": os.path.join(run, "config.yml"),
        "checkpoint_path": os.path.join(run, "checkpoints", "latest.ckpt"),
        "image_channel": 1, "image_size": 32, "num_samples": 4,
        "ddim_style": "ddim5",
        "output_path": str(tmp_path / "out" / "test_dpms_result.png"),
    }
    out = SAMPLERS["test_dpms"](sampler_cfg).start()
    assert os.path.exists(out)
