#!/usr/bin/env python
"""Training launcher.

Replaces the reference's torchrun wrapper scripts
(``/root/reference/scripts/dist_train_*.sh``): one python process per host
drives all local TPU chips via GSPMD, so there is no per-GPU process spawn;
multi-host runs just set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID and run this same script on every host.

The trainer type is inferred from the config schema (the reference picks a
trainer by which script you launch; the config keys identify it uniquely):
  * denoise_fn_config                -> regular diffusion
  * encoder_config + decoder_config  -> PDAE representation learning
  * latent_denoise_fn_config         -> latent DPM
  * inferred_latents w/o latent fn   -> manipulation classifier

Usage:
  python scripts/train.py --config_path config/mnist_regular.yml \
      --run_path runs/mnist [--resume latest] [--max_steps N]

``--set dotted.key=value`` overrides any config field without editing
the YAML (repeatable; values parsed as python literals when possible),
e.g. flip a run to FSDP + sharded checkpoints:
  --set runner_config.param_sharding=fsdp \
  --set runner_config.checkpoint_format=sharded
"""

import argparse
import os
import sys

# make the repo importable when launched as scripts/train.py (the reference
# exports PYTHONPATH in its bash wrappers, scripts/dist_*.sh)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick_trainer(config: dict):
    from pdae_tpu import training
    if "denoise_fn_config" in config:
        return training.RegularDiffusionTrainer
    if "encoder_config" in config and "decoder_config" in config:
        return training.RepresentationLearningTrainer
    if "latent_denoise_fn_config" in config:
        return training.LatentDiffusionTrainer
    if "inferred_latents" in config:
        return training.ManipulationTrainer
    raise SystemExit("cannot infer trainer type from config keys")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config_path", required=True)
    p.add_argument("--run_path", required=True)
    p.add_argument("--resume", default=None,
                   help="'latest' or a checkpoint path")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before init")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="override a config field by dotted path "
                        "(repeatable), e.g. --set "
                        "runner_config.steps_per_dispatch=8")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from pdae_tpu.parallel import init_distributed
    from pdae_tpu.utils import load_yaml
    init_distributed()

    config = load_yaml(args.config_path)
    from pdae_tpu.utils import apply_overrides
    apply_overrides(config, args.overrides, dotted=True)
    trainer_cls = pick_trainer(config)
    print(f"trainer: {trainer_cls.__name__}", flush=True)
    trainer = trainer_cls(config=config, run_path=args.run_path,
                          resume=args.resume, seed=args.seed)
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
