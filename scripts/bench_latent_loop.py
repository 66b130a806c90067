#!/usr/bin/env python
"""REAL latent-training loop wall-clock: steps_per_dispatch K / transfer diet.

VERDICT r4 #3 asked what a USER's stage-3 loop does.  Answer (PERF.md
"The REAL stage-3 loop"): dispatch is FREE (0.1 ms RTT, async-hidden)
and the loop is bound by host->device batch BYTES over the tunnel, so
the levers are the step-key filter (automatic) and ``--u8``
(transfer_uint8), not steps_per_dispatch.  This script drives the
actual ``LatentDiffusionTrainer`` (loader -> prefetch -> jitted
scan -> metrics) at the shipped celeba64_latent.yml geometry (flagship
frozen encoder, MLPSkipNet 2048x10, batch 128) over synthetic data, and
times ``train()`` wall seconds per step for each K.

    python scripts/bench_latent_loop.py --ks 1,8 --steps 192 --preload [--u8]

Reference counterpart being beaten: one host-driven step per dispatch,
/root/reference/trainer/train_latent_diffusion.py:95-130.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DDPM_MODEL = {
    "model": "UNet", "input_channel": 3, "base_channel": 128,
    "channel_multiplier": [1, 2, 2, 4], "num_residual_blocks_of_a_block": 2,
    "attention_resolutions": [16], "num_heads": 4, "head_channel": -1,
    "use_new_attention_order": False, "dropout": 0.0,
}

PDAE_CFG = {
    "encoder_config": {"model": "CELEBA64Encoder", "latent_dim": 512},
    "decoder_config": {"model": "ShiftUNet", "latent_dim": 512},
    "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
    "diffusion_config": {"timesteps": 1000, "betas_type": "linear"},
}


def build_artifacts(root: str):
    """Synthetic flagship-geometry stage-2 artifacts (weights random --
    the loop timing does not care what the frozen encoder computes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdae_tpu.models import build_decoder, build_encoder
    from pdae_tpu.utils import init_key, save_checkpoint

    enc = build_encoder(PDAE_CFG["encoder_config"], image_size=64)
    dec = build_decoder(PDAE_CFG["decoder_config"], DDPM_MODEL)
    x = jnp.zeros((1, 64, 64, 3))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, 512))
    ep = jax.jit(enc.init)(init_key(0), x)["params"]
    dp = jax.jit(dec.init)(init_key(1), x, t, z)["params"]
    save_checkpoint(os.path.join(root, "pdae.ckpt"),
                    {"ema_encoder": ep, "ema_decoder": dp})
    rs = np.random.RandomState(0)
    save_checkpoint(os.path.join(root, "latents.ckpt"),
                    {"mean": (0.1 * rs.standard_normal(512)).astype(
                         np.float32),
                     "std": (0.5 + rs.rand(512)).astype(np.float32)})


def latent_cfg(root: str, k: int, batch: int, preload: bool = False,
               u8: bool = False, resident: bool = False,
               corpus: int = 0, sampling: str = "epoch"):
    return {
        "train_dataset_config": {
            "name": "SYNTHETIC", "image_size": 64, "image_channel": 3,
            "length": corpus or 4 * batch, "latent_dim": 512,
            "preload": preload, "transfer_uint8": u8,
            "device_resident": resident, "resident_sampling": sampling},
        "eval_dataset_config": {},
        "diffusion_config": {"timesteps": 1000, "betas_type": "linear"},
        "trained_ddpm_config": {"denoise_fn_config": DDPM_MODEL},
        "trained_representation_learning_config": PDAE_CFG,
        "trained_representation_learning_checkpoint":
            os.path.join(root, "pdae.ckpt"),
        "inferred_latents": os.path.join(root, "latents.ckpt"),
        # celeba64_latent.yml geometry
        "latent_denoise_fn_config": {
            "model": "MLPSkipNet", "input_channel": 512,
            "model_channel": 2048, "num_layers": 10,
            "time_emb_channel": 64, "use_norm": True, "dropout": 0.0},
        "dataloader_config": {"train": {"num_workers": 1,
                                        "batch_size": batch},
                              "eval": {"num_generations": 1}},
        "optimizer_config": {"name": "AdamW", "lr": 1e-3,
                             "adam_betas": "(0.9, 0.999)",
                             "adam_eps": 1e-8, "weight_decay": 0.01,
                             "enable_amp": False},
        "runner_config": {
            "steps_per_dispatch": k,
            "display_steps": 4 * k * 10 ** 4,
            "evaluate_every_steps": 4 * k * 10 ** 6,
            "save_latest_every_steps": 4 * k * 10 ** 6,
            "save_checkpoint_every_steps": 4 * k * 10 ** 6,
            "num_iterations": 1, "ema_every": 1, "ema_decay": 0.9999,
            "compile": False},
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ks", default="1,8,32")
    p.add_argument("--steps", type=int, default=96,
                   help="timed steps per K (after a warm chunk)")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--preload", action="store_true",
                   help="pre-generate the synthetic items so the loader "
                        "is ~free (emulates a real >100-vCPU TPU host)")
    p.add_argument("--u8", action="store_true",
                   help="transfer_uint8 batches (with the automatic step-"
                        "key filter this moves 1.57 MB/step instead of "
                        "8.4 MB -- the transfer-bound loop's lever)")
    p.add_argument("--resident", action="store_true",
                   help="device_resident corpus: zero per-step transfer, "
                        "on-device index sampling (training/resident.py). "
                        "Per-step cost is corpus-size-independent (the "
                        "gather reads B rows either way); --corpus only "
                        "changes HBM footprint + one-time materialize")
    p.add_argument("--corpus", type=int, default=0,
                   help="dataset length override (default 4*batch)")
    p.add_argument("--sampling", default="epoch",
                   choices=("epoch", "uniform"),
                   help="resident index stream: 'epoch' = host-loader-"
                        "equal rows (~25 KB/dispatch), 'uniform' = in-jit "
                        "draws (zero per-step host bytes)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    root_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root_repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pdae_tpu.training import LatentDiffusionTrainer

    work = tempfile.mkdtemp(prefix="latloop_")
    try:
        build_artifacts(work)
        results = {}
        for k in [int(v) for v in args.ks.split(",")]:
            run = os.path.join(work, f"run_k{k}")
            tr = LatentDiffusionTrainer(config=latent_cfg(work, k,
                                                          args.batch,
                                                          args.preload,
                                                          args.u8,
                                                          args.resident,
                                                          args.corpus,
                                                          args.sampling),
                                        run_path=run)
            warm = 2 * k
            # save_on_exit=False: train() normally checkpoints on exit,
            # and a full MLPSkipNet state gather+msgpack (~700 MB on this
            # geometry) inside the timed window once inflated ms_per_step
            # ~8x and produced a bogus "loader-bound" verdict
            # (records/latent_loop_r05_loaderbound.json, superseded).
            tr.train(max_steps=warm, save_on_exit=False)  # compile+warm
            jax.block_until_ready(tr.state.params)
            n = (args.steps // k) * k or k
            # count steps from the LIVE counter and drain the async
            # dispatch queue inside the window -- an earlier protocol
            # trusted max_steps segmentation and left the tail in flight
            s0 = int(tr.state.step)
            t0 = time.perf_counter()
            tr.train(max_steps=s0 + n, save_on_exit=False)
            jax.block_until_ready(tr.state.params)
            dt = time.perf_counter() - t0
            n_act = int(tr.state.step) - s0
            results[f"k{k}"] = {
                "steps_per_sec": round(n_act / dt, 2),
                "ms_per_step": round(1e3 * dt / n_act, 3),
                "timed_steps": n_act,
            }
            print(f"[k={k}: {n_act} steps in {dt:.2f}s = "
                  f"{n_act/dt:.1f} steps/s]", file=sys.stderr)
        base = results.get("k1", {}).get("steps_per_sec")
        for k, r in results.items():
            r["speedup_vs_k1"] = (round(r["steps_per_sec"] / base, 2)
                                  if base else None)
        print(json.dumps({"what": "real_latent_loop_wall",
                          "preload": bool(args.preload),
                          "transfer_uint8": bool(args.u8),
                          "device_resident": bool(args.resident),
                          "sampling": args.sampling,
                          "corpus": args.corpus or 4 * args.batch,
                          "batch": args.batch,
                          "device": str(jax.devices()[0]),
                          **results}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
