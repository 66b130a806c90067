#!/usr/bin/env python
"""Convert reference torch ``.pt`` checkpoints to pdae_tpu msgpack format.

Covers every artifact the reference distributes (README.md:45-51):
pre-trained DPMs ('ema_denoise_fn'), trained PDAE autoencoders
('ema_encoder'/'ema_decoder'), latent DPMs, manipulation classifiers, and
inferred-latent stats files.

Usage:
  python scripts/convert_torch_checkpoint.py in.pt out.ckpt \
      [--encoder-stages {4,5}]     # 4 = 64px geometry, 5 = 128px
  python scripts/convert_torch_checkpoint.py latents.pt latents.ckpt --stats
  # reverse: our .ckpt -> reference-loadable torch .pt
  python scripts/convert_torch_checkpoint.py in.ckpt out.pt --export
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--encoder-stages", type=int, default=4, choices=(4, 5))
    p.add_argument("--stats", action="store_true",
                   help="input is an inferred-latents {mean,std} file")
    p.add_argument("--inception", action="store_true",
                   help="input is the TF-FID InceptionV3 state dict "
                        "(pt_inception-2015-12-05)")
    p.add_argument("--lpips", action="store_true",
                   help="input is an lpips-package (AlexNet) or torchvision "
                        "alexnet state dict")
    p.add_argument("--export", action="store_true",
                   help="reverse direction: OUR .ckpt -> torch .pt the "
                        "reference trainers/samplers can load")
    args = p.parse_args(argv)

    import torch
    import numpy as np
    from pdae_tpu.utils import save_checkpoint
    from pdae_tpu.utils.torch_convert import convert_reference_checkpoint

    if args.export:
        from pdae_tpu.utils import load_checkpoint
        from pdae_tpu.utils.torch_convert import export_reference_checkpoint
        ours = load_checkpoint(args.input)
        exported = export_reference_checkpoint(
            ours, num_encoder_stages=args.encoder_stages)
        # copy=True: msgpack-loaded arrays are read-only buffers
        def _t(a):
            return torch.from_numpy(np.array(a, copy=True))
        out = {k: ({kk: _t(vv) for kk, vv in v.items()}
                   if isinstance(v, dict) else
                   (_t(v) if isinstance(v, np.ndarray) else v))
               for k, v in exported.items()}
        torch.save(out, args.output)
        print(f"exported {args.input} -> {args.output} "
              f"(keys: {sorted(out)})")
        return

    data = torch.load(args.input, map_location="cpu", weights_only=False)
    if args.inception:
        from pdae_tpu.metrics.inception import convert_inception_state_dict
        sd = data.state_dict() if hasattr(data, "state_dict") else data
        out = convert_inception_state_dict(sd)
    elif args.lpips:
        from pdae_tpu.utils.torch_convert import convert_lpips_state_dict
        sd = data.state_dict() if hasattr(data, "state_dict") else data
        out = convert_lpips_state_dict(
            {k: v.numpy() if hasattr(v, "numpy") else v
             for k, v in sd.items()})
    elif args.stats:
        out = {"mean": np.asarray(data["mean"].numpy(), np.float32),
               "std": np.asarray(data["std"].numpy(), np.float32)}
    else:
        out = convert_reference_checkpoint(
            data, num_encoder_stages=args.encoder_stages)
    save_checkpoint(args.output, out)
    print(f"converted {args.input} -> {args.output} "
          f"(keys: {sorted(out)})")


if __name__ == "__main__":
    main()
