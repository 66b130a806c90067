#!/usr/bin/env python
"""LSUN-scale LMDB reader proof: throughput at millions of keys.

HORSE/BEDROOM are 2,000,340 / 3,033,042-entry packs (reference
``dataset/horse.py:34-40``, key format ``256-%07d``).  The from-scratch
readers are correctness-tested to B+tree depth 4, but per-get cost and
page-cache behavior only show up at real key counts -- this script builds
a synthetic 2M-entry pack with ``write_lmdb_stream`` (constant memory),
then measures:

  * python ``Reader`` and C++ ``NativeReader`` random-get throughput
  * end-to-end ``LMDBImageDataset`` loader imgs/s (decode+resize+collate)
    against that pack, HORSE-configured (128px, no crop)

and reports headroom vs the 128px train-step consumption.  Values cycle
through a pool of distinct real JPEGs so the pack has realistic value
sizes without 2M encode passes.

    python scripts/bench_lmdb_scale.py                    # full 2,000,340
    python scripts/bench_lmdb_scale.py --entries 200000   # quick
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdae_tpu.data.lmdb_store import NativeReader, Reader, write_lmdb_stream


def synth_jpegs(n, size, quality, seed):
    import io

    from PIL import Image
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    out = []
    for i in range(n):
        base = np.stack([
            127 + 100 * np.sin(xx / (9 + i % 7) + i),
            127 + 100 * np.cos(yy / (11 + i % 5)),
            127 + 100 * np.sin((xx + yy) / (13 + i % 3)),
        ], -1)
        img = np.clip(base + rs.randn(size, size, 3) * 18,
                      0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=quality)
        out.append(buf.getvalue())
    return out


def build_pack(path, entries, jpegs):
    t0 = time.perf_counter()

    def items():
        for i in range(entries):
            yield (b"256-%07d" % i), jpegs[i % len(jpegs)]

    write_lmdb_stream(path, items())
    return time.perf_counter() - t0


def bench_gets(reader, entries, n_gets, seed=0):
    rs = np.random.RandomState(seed)
    keys = [b"256-%07d" % k
            for k in rs.randint(0, entries, size=n_gets)]
    t0 = time.perf_counter()
    total = 0
    for k in keys:
        v = reader.get(k)
        total += len(v)
    dt = time.perf_counter() - t0
    assert total > 0
    return n_gets / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--entries", type=int, default=2000340)
    p.add_argument("--distinct", type=int, default=512)
    p.add_argument("--jpeg_size", type=int, default=256)
    p.add_argument("--quality", type=int, default=85)
    p.add_argument("--n_gets", type=int, default=50000)
    p.add_argument("--n_images", type=int, default=512,
                   help="end-to-end loader sample size")
    p.add_argument("--keep", default=None,
                   help="build/reuse the pack at this path instead of tmp")
    p.add_argument("--consumption128", type=float, default=264.0,
                   help="train imgs/s/chip @128px (PERF.md)")
    args = p.parse_args()

    res = {"entries": args.entries}
    tmp_ctx = (tempfile.TemporaryDirectory() if args.keep is None
               else None)
    root = tmp_ctx.name if tmp_ctx else os.path.dirname(
        os.path.abspath(args.keep))
    path = (os.path.join(root, "horse_synth.lmdb") if tmp_ctx
            else args.keep)
    try:
        if not os.path.exists(path):
            jpegs = synth_jpegs(args.distinct, args.jpeg_size,
                                args.quality, seed=3)
            res["value_bytes_mean"] = int(np.mean([len(j) for j in jpegs]))
            res["write_secs"] = round(build_pack(path, args.entries, jpegs),
                                      1)
        res["pack_gb"] = round(os.path.getsize(
            os.path.join(path, "data.mdb") if os.path.isdir(path)
            else path) / 1e9, 2)

        r = Reader(os.path.join(path, "data.mdb")
                   if os.path.isdir(path) else path)
        res["python_gets_per_sec"] = round(
            bench_gets(r, args.entries, min(args.n_gets, 20000)), 1)
        r.close()
        try:
            nr = NativeReader(os.path.join(path, "data.mdb")
                              if os.path.isdir(path) else path)
            res["native_gets_per_sec"] = round(
                bench_gets(nr, args.entries, args.n_gets), 1)
            nr.close()
        except Exception as e:  # native lib unavailable
            res["native_gets_per_sec"] = None
            res["native_error"] = str(e)

        # end-to-end loader path at this key count, HORSE geometry
        from pdae_tpu.data.datasets import LMDBImageDataset

        class _Horse(LMDBImageDataset):
            key_fmt = "256-%07d"
            crop = None

        _Horse.length = args.entries
        rng = np.random.default_rng(0)
        for mode, fast in [("pil", False), ("native", True)]:
            ds = _Horse({"data_path": path, "image_size": 128,
                         "image_channel": 3, "augmentation": True,
                         "fast_decode": fast})
            idx = np.random.RandomState(1).randint(
                0, args.entries, size=args.n_images)
            items = [ds.__getitem__(int(i), rng) for i in idx[:8]]  # warm
            t0 = time.perf_counter()
            items = [ds.__getitem__(int(i), rng) for i in idx]
            _Horse.collate_fn(items)
            rate = args.n_images / (time.perf_counter() - t0)
            res[f"loader_{mode}_imgs_per_sec_core"] = round(rate, 1)
        best = max(v for k, v in res.items()
                   if k.startswith("loader_") and v)
        res["cores_to_feed_one_chip_128px"] = round(
            args.consumption128 / best, 2)
    finally:
        if tmp_ctx:
            tmp_ctx.cleanup()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
