#!/usr/bin/env python
"""Inspect and convert pdae_tpu checkpoints.

Works on both on-disk forms -- the single msgpack file (default,
reference-shaped: one ``torch.save``-like dict, utils/checkpoint.py)
and the per-process sharded directory (``checkpoint_format: sharded``,
utils/sharded_checkpoint.py).

Usage:
  python scripts/ckpt_tool.py info  run/checkpoints/latest.ckpt
  python scripts/ckpt_tool.py to-sharded latest.ckpt latest.sharded
  python scripts/ckpt_tool.py to-full  latest.sharded latest.ckpt

``info`` prints the format, the top-level logical keys (the 4-stage
composition contract: ``ema_denoise_fn`` / ``ema_encoder`` / ... ), leaf
counts, parameter counts, dtypes, and total bytes.  ``to-full`` turns a
sharded directory into a single file any external consumer (e.g.
``convert_torch_checkpoint.py --export``) can read without knowing the
sharded layout; ``to-sharded`` pre-splits a file for runs that resume
under ``checkpoint_format: sharded`` (resume accepts either form, so
this is only an optimization, not a requirement).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _leaf_iter(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_iter(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        yield prefix, tree


def info(path: str) -> None:
    from pdae_tpu.utils import is_sharded_checkpoint, load_checkpoint
    raw = load_checkpoint(path)
    fmt = "sharded" if is_sharded_checkpoint(path) else "full"
    print(f"format: {fmt}")
    if fmt == "sharded":
        import glob
        files = sorted(glob.glob(os.path.join(path, "shard-*.msgpack")))
        print(f"shard files: {len(files)}")
    step = raw.get("step")
    if step is not None and np.ndim(step) == 0:
        print(f"step: {int(step)}")
    print("keys:")
    for key, sub in raw.items():
        if key == "step":
            continue
        leaves = list(_leaf_iter(sub))
        arrs = [l for _, l in leaves if hasattr(l, "size")]
        n_params = sum(int(np.asarray(a).size) for a in arrs)
        n_bytes = sum(np.asarray(a).nbytes for a in arrs)
        dtypes = sorted({str(np.asarray(a).dtype) for a in arrs})
        print(f"  {key}: {len(leaves)} leaves, {n_params:,} params, "
              f"{n_bytes / 1e6:.1f} MB, dtypes={','.join(dtypes) or '-'}")


def to_full(src: str, dst: str) -> None:
    from pdae_tpu.utils import (is_sharded_checkpoint, load_checkpoint,
                                save_checkpoint)
    if not is_sharded_checkpoint(src):
        raise SystemExit(f"{src} is not a sharded checkpoint directory")
    save_checkpoint(dst, load_checkpoint(src))
    print(f"wrote {dst}")


def to_sharded(src: str, dst: str) -> None:
    from pdae_tpu.utils import load_checkpoint, save_sharded_checkpoint
    if os.path.isdir(src):
        raise SystemExit(f"{src} is already a directory")
    save_sharded_checkpoint(dst, load_checkpoint(src))
    print(f"wrote {dst}/")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("info", help="print structure/format of a ckpt")
    pi.add_argument("path")
    pf = sub.add_parser("to-full", help="sharded dir -> single file")
    pf.add_argument("src")
    pf.add_argument("dst")
    ps = sub.add_parser("to-sharded", help="single file -> sharded dir")
    ps.add_argument("src")
    ps.add_argument("dst")
    args = p.parse_args(argv)
    # host-side tool: never spin up the TPU backend for file IO (the
    # axon plugin ignores the JAX_PLATFORMS env var; set via config)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    if args.cmd == "info":
        info(args.path)
    elif args.cmd == "to-full":
        to_full(args.src, args.dst)
    else:
        to_sharded(args.src, args.dst)


if __name__ == "__main__":
    main()
