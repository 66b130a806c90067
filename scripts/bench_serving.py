#!/usr/bin/env python
"""Concurrent serving benchmark: QPS + latency percentiles for the
resident ``PDAEService`` under N batch-1 clients, coalescing off vs on.

The reference has no serving story at all (one-shot torchrun scripts);
this measures ours under the production pattern that motivates the
``CoalescingBatcher``: many independent clients each posting ONE image.
Per setting it reports QPS, p50/p95 request latency, and the number of
underlying service invocations (coalescing quality: calls << requests).

The service is built with RANDOM weights saved under the real logical
keys -- THROUGHPUT only; outputs are meaningless.  Geometries:
  * ``tiny``     -- base-8 UNet at 64px (CPU smoke)
  * ``celeba64`` -- the flagship 64px ShiftUNet (the chip serving regime)

Usage:
  python scripts/bench_serving.py --geometry tiny --platform cpu \\
      --threads 4 --requests 2 --style dpm5
  python scripts/bench_serving.py --geometry celeba64 --threads 8 \\
      --requests 4 --style dpm20         # on the TPU chip
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_DDPM = {
    "model": "UNet", "input_channel": 1, "base_channel": 8,
    "channel_multiplier": [1, 2], "num_residual_blocks_of_a_block": 1,
    "attention_resolutions": [], "num_heads": 1, "head_channel": -1,
    "use_new_attention_order": False, "dropout": 0.0,
}


def build_service(geometry: str, style: str, max_batch: int, workdir: str):
    import jax
    import jax.numpy as jnp

    # build the synthetic weights through the SAME factory objects the
    # service's SamplerContext will call, so the saved params always
    # match the service's templates (the test suite monkeypatches
    # context.build_encoder for its tiny stacks)
    import pdae_tpu.sampling.context as ctx_mod
    build_decoder, build_encoder = ctx_mod.build_decoder, ctx_mod.build_encoder
    from pdae_tpu.serving import PDAEService
    from pdae_tpu.utils import init_key, save_checkpoint

    if geometry == "tiny":
        # tiny UNet but the real 64px encoder geometry (the registry has
        # no 16px encoder; the UNet dominates cost anyway)
        ddpm = TINY_DDPM
        size, chans, latent = 64, 1, 8
    else:
        from __graft_entry__ import CELEBA64_DPM
        ddpm = {"model": "UNet", **CELEBA64_DPM}
        size, chans, latent = 64, 3, 512

    enc_cfg = {"model": f"bench{size}", "latent_dim": latent}
    dec_cfg = {"model": "ShiftUNet", "latent_dim": latent}
    encoder = build_encoder(enc_cfg, image_size=size)
    decoder = build_decoder(dec_cfg, ddpm)

    x = jnp.zeros((1, size, size, chans))
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, latent))
    enc_params = jax.jit(encoder.init)(init_key(0), x)["params"]
    dec_params = jax.jit(decoder.init)(init_key(1), x, t, z)["params"]
    ckpt = os.path.join(workdir, "synthetic.ckpt")
    save_checkpoint(ckpt, {"ema_encoder": enc_params,
                           "ema_decoder": dec_params})

    pdae_cfg = {
        "train_dataset_config": {"image_size": size, "image_channel": chans},
        "diffusion_config": {"timesteps": 1000, "betas_type": "linear"},
        "encoder_config": enc_cfg,
        "decoder_config": dec_cfg,
        "trained_ddpm_config": {"denoise_fn_config": ddpm},
    }
    return PDAEService({
        "config_path": pdae_cfg,
        "checkpoint_path": ckpt,
        "trained_ddpm_config_path": {"denoise_fn_config": ddpm},
        "image_size": size, "image_channel": chans,
        "max_batch": max_batch,
        "encoder_ddim_style": style, "decoder_ddim_style": style,
    }), size, chans


def run_clients(call, n_threads: int, per_thread: int):
    """``call()`` from n_threads concurrent clients; returns per-request
    wall latencies (seconds) and the total wall time."""
    latencies = [[] for _ in range(n_threads)]
    errors = []
    barrier = threading.Barrier(n_threads)

    def client(i):
        try:
            barrier.wait()
            for _ in range(per_thread):
                t0 = time.perf_counter()
                call()
                latencies[i].append(time.perf_counter() - t0)
        except Exception as e:   # surfaced after join
            errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_threads)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    if errors:
        raise RuntimeError(f"client errors: {errors[:3]}")
    return [l for ls in latencies for l in ls], wall


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--geometry", default="tiny",
                   choices=("tiny", "celeba64"))
    p.add_argument("--style", default="dpm5",
                   help="encode+decode style per request (dpm<N>/ddim<N>)")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--requests", type=int, default=4,
                   help="requests per client thread")
    p.add_argument("--coalesce_ms", default="0,3",
                   help="comma list of batcher windows to measure "
                        "(0 = direct service calls)")
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from pdae_tpu.serving import CoalescingBatcher

    with tempfile.TemporaryDirectory() as workdir:
        service, size, chans = build_service(args.geometry, args.style,
                                             max_batch=args.threads,
                                             workdir=workdir)
        img = np.zeros((1, size, size, chans), np.uint8)

        # warm every power-of-two bucket the batcher can produce (1 ..
        # threads): coalesced groups land on intermediate buckets and a
        # cold compile inside the measured window would be charged to
        # latency
        b = 1
        while b < args.threads:
            service.autoencode(np.zeros((b, size, size, chans), np.uint8))
            b *= 2
        # the cap bucket: group sizes above the last power of two map to
        # min(next_pow2, max_batch) == threads (non-power-of-two counts)
        service.autoencode(
            np.zeros((args.threads, size, size, chans), np.uint8))

        results = {"geometry": args.geometry, "style": args.style,
                   "threads": args.threads,
                   "requests_per_thread": args.requests,
                   "device": str(__import__("jax").devices()[0]),
                   "settings": []}
        for win in [float(v) for v in args.coalesce_ms.split(",")]:
            if win > 0:
                batcher = CoalescingBatcher(service, window_ms=win)
                call = lambda: batcher.submit("autoencode", img)
            else:
                batcher = None
                call = lambda: service.autoencode(img)
            call()                         # warm the bucketed programs
            n0 = batcher.stats()["calls"] if batcher else None
            lats, wall = run_clients(call, args.threads, args.requests)
            n_req = len(lats)
            lats_ms = sorted(1000.0 * l for l in lats)
            entry = {
                "coalesce_ms": win,
                "qps": round(n_req / wall, 2),
                # nearest-rank percentiles: index ceil(q*n)-1 (biased
                # variants mis-report badly at small n: n//2 gives the
                # MAXIMUM as p50 at n=2)
                "p50_ms": round(
                    lats_ms[max(0, -(-n_req * 50 // 100) - 1)], 1),
                "p95_ms": round(
                    lats_ms[max(0, -(-n_req * 95 // 100) - 1)], 1),
                "wall_s": round(wall, 2),
            }
            if batcher:
                entry["service_calls"] = batcher.stats()["calls"] - n0
                entry["requests"] = n_req
                batcher.close()
            results["settings"].append(entry)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
