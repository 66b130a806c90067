#!/usr/bin/env python
"""Pack an image folder into an LMDB environment readable by pdae_tpu
(and by the reference's loaders).

The reference assumes pre-packaged LMDBs with dataset-specific key formats
(SURVEY.md #24); this tool builds them with our own writer -- no ``lmdb``
binding needed.

Usage:
  python scripts/prepare_lmdb.py IMAGE_DIR OUT_LMDB_DIR \
      --key-format '256-%05d' [--size 256] [--quality 90] [--limit N]

Key formats by dataset: CELEBA64 'None-%07d', FFHQ/CELEBAHQ '256-%05d',
HORSE/BEDROOM '256-%07d'.
"""

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("image_dir")
    p.add_argument("out_dir")
    p.add_argument("--key-format", default="256-%05d")
    p.add_argument("--size", type=int, default=None,
                   help="optionally resize (shorter side) before packing")
    p.add_argument("--quality", type=int, default=95)
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from PIL import Image
    from pdae_tpu.data import write_lmdb_stream

    exts = {".png", ".jpg", ".jpeg", ".webp", ".bmp"}
    files = sorted(
        os.path.join(args.image_dir, f) for f in os.listdir(args.image_dir)
        if os.path.splitext(f)[1].lower() in exts)
    if args.limit:
        files = files[:args.limit]
    if not files:
        raise SystemExit(f"no images found in {args.image_dir}")

    def encoded():
        """One image at a time -- peak RSS stays ~one image regardless of
        dataset size (the zero-padded key formats are generated sorted, as
        the streaming writer requires).  A 3M-image LSUN pack previously
        needed the whole re-encoded dataset in memory."""
        for i, path in enumerate(files):
            img = Image.open(path).convert("RGB")
            if args.size:
                w, h = img.size
                s = args.size / min(w, h)
                img = img.resize((round(w * s), round(h * s)), Image.LANCZOS)
            buf = io.BytesIO()
            img.save(buf, format="JPEG", quality=args.quality)
            yield (args.key_format % i).encode(), buf.getvalue()
            if (i + 1) % 1000 == 0:
                print(f"{i + 1}/{len(files)}", flush=True)

    out = write_lmdb_stream(args.out_dir, encoded())
    print(f"packed {len(files)} images -> {out}")


if __name__ == "__main__":
    main()
