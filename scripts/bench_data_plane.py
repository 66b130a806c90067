#!/usr/bin/env python
"""Data-plane throughput benchmark: JPEG decode -> crop -> resize -> hflip ->
normalize -> collate, per host core, at both flagship geometries.

Synthesizes celeba-geometry (178x218) and 256px JPEGs into a temp LMDB
(our from-scratch writer) and measures the REAL ``LMDBImageDataset``
decode path (PIL vs native C++ ``fast_decode``), exactly as Loader workers
run it.  Compares against the measured train-step consumption to report
how many host cores keep the chip fed.

Prints one JSON line.  Reproduces the PARITY.md data-plane numbers.
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdae_tpu.data.datasets import LMDBImageDataset
from pdae_tpu.data.lmdb_store import write_lmdb


def synth_jpegs(n, w, h, quality, seed=0):
    """Realistic-entropy JPEGs: smooth gradients + texture noise."""
    from PIL import Image
    rs = np.random.RandomState(seed)
    out = []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        base = (np.stack([
            127 + 100 * np.sin(xx / (9 + i % 7) + i),
            127 + 100 * np.cos(yy / (11 + i % 5)),
            127 + 100 * np.sin((xx + yy) / (13 + i % 3)),
        ], -1))
        img = np.clip(base + rs.randn(h, w, 3) * 18, 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=quality)
        out.append(buf.getvalue())
    return out


def build_dataset(tmpdir, tag, jpegs, key_fmt, crop, image_size,
                  fast_decode):
    path = os.path.join(tmpdir, f"{tag}.lmdb")
    if not os.path.exists(path):
        write_lmdb(path, {(key_fmt % i).encode(): b
                          for i, b in enumerate(jpegs)})

    class _Bench(LMDBImageDataset):
        pass

    _Bench.key_fmt = key_fmt
    _Bench.crop = crop
    _Bench.length = len(jpegs)
    return _Bench({"data_path": path, "image_size": image_size,
                   "image_channel": 3, "augmentation": True,
                   "fast_decode": fast_decode})


def measure(ds, n_images, batch=32, reps=2):
    rng = np.random.default_rng(0)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for start in range(0, n_images, batch):
            items = [ds.__getitem__(i % ds.length, rng)
                     for i in range(start, min(start + batch, n_images))]
            type(ds).collate_fn(items)
        best = max(best, n_images / (time.perf_counter() - t0))
    return round(best, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_jpegs", type=int, default=256)
    p.add_argument("--n_images", type=int, default=512)
    p.add_argument("--quality", type=int, default=95)
    p.add_argument("--consumption64", type=float, default=663.0,
                   help="train imgs/s/chip @64px (bench.py train_64px)")
    p.add_argument("--consumption128", type=float, default=264.0,
                   help="train imgs/s/chip @128px (PARITY.md)")
    args = p.parse_args()

    from pdae_tpu.data.native_image import available
    res = {"host_cores": os.cpu_count(), "native_available": available()}

    with tempfile.TemporaryDirectory() as tmp:
        celeba = synth_jpegs(args.n_jpegs, 178, 218, args.quality, seed=1)
        big = synth_jpegs(args.n_jpegs, 256, 256, args.quality, seed=2)

        for tag, jpegs, fmt, crop, size, consumption in [
                ("64px", celeba, "None-%07d", (57, 25, 128, 128), 64,
                 args.consumption64),
                ("128px", big, "256-%05d", None, 128, args.consumption128)]:
            for mode, fast in [("pil", False), ("native", True)]:
                if fast and not available():
                    res[f"{tag}_{mode}_imgs_per_sec_core"] = None
                    continue
                ds = build_dataset(tmp, tag, jpegs, fmt, crop, size, fast)
                rate = measure(ds, args.n_images)
                res[f"{tag}_{mode}_imgs_per_sec_core"] = rate
            best = max(v for k, v in res.items()
                       if k.startswith(tag) and v)
            res[f"{tag}_cores_to_feed_one_chip"] = round(
                consumption / best, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
