#!/usr/bin/env python
"""Sampler/eval launcher.

Replaces the reference's ``scripts/dist_sample.sh`` (which swaps the
sampler file by editing the script, reference scripts/dist_sample.sh:10-21)
with an explicit ``--sampler`` name; configs are YAML files with the same
fields as the reference's inline dicts (see configs/sampler/*.yml).

Usage:
  python scripts/sample.py --sampler autoencoding_eval \
      --config configs/sampler/autoencoding_eval.yml [--platform cpu]

``--set key=value`` overrides any top-level config field without editing
the YAML (repeatable; values parsed as python literals when possible),
e.g. switch a run to the fast solver styles:
  --set encoder_ddim_style=dpm20 --set decoder_ddim_style=dpm20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sampler", required=True)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("--platform", default=None)
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="override a top-level config field (repeatable), "
                        "e.g. --set decoder_ddim_style=dpm20")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from pdae_tpu.parallel import init_distributed
    from pdae_tpu.sampling import SAMPLERS
    from pdae_tpu.utils import load_yaml

    if args.sampler not in SAMPLERS:
        raise SystemExit(f"unknown sampler {args.sampler!r}; "
                         f"available: {sorted(SAMPLERS)}")
    init_distributed()
    config = load_yaml(args.config)
    from pdae_tpu.utils import apply_overrides
    apply_overrides(config, args.overrides, dotted=False)
    sampler = SAMPLERS[args.sampler](config)
    result = sampler.start()
    print(f"{args.sampler}: done -> {result}")


if __name__ == "__main__":
    main()
