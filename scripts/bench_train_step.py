#!/usr/bin/env python
"""Honest train-step timing: K scanned steps, slope between two K values.

Per-dispatch timing through the TPU tunnel carries a ~25 ms fixed
round-trip plus +/-30% jitter under host load (CLAUDE.md); scanning K
serially-dependent full train steps inside ONE program and taking the
slope between two K values removes both.  MFU comes from XLA
cost_analysis of the single compiled step (no scan inside it, so no
under-count).

    python scripts/bench_train_step.py --batch 64
    python scripts/bench_train_step.py --batch 16 --size 128 --remat
    python scripts/bench_train_step.py --batch 64 --gn_vjp off
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=64, choices=[64, 128])
    p.add_argument("--remat", action="store_true",
                   help="checkpoint the decoder fwd (128px train config)")
    p.add_argument("--gn_vjp", default="auto", choices=["auto", "on", "off"],
                   help="stat-caching closed-form GN backward (ops)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k_lo", type=int, default=2)
    p.add_argument("--k_hi", type=int, default=8)
    p.add_argument("--reps", type=int, default=3,
                   help="slope samples (min taken)")
    p.add_argument("--platform", default=None)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="jax.profiler trace of a few steps into DIR + "
                        "top-op summary to stderr")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        root, ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM
    from pdae_tpu import ops
    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import ShiftUNet, encoder_for_resolution
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    if args.gn_vjp != "auto":
        ops.set_gn_train_vjp(args.gn_vjp == "on")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    geometry = CELEBA64_DPM if args.size == 64 else FFHQ128_DPM
    B = args.batch

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    decoder = ShiftUNet(latent_dim=512, dtype=dtype, **geometry)
    encoder = encoder_for_resolution(args.size, 512, dtype=dtype)
    x1 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    enc_params = jax.jit(encoder.init)(init_key(0), x1)["params"]
    dec_params = jax.jit(decoder.init)(
        init_key(1), x1, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 512)))["params"]
    shift_params, frozen = split_shift_unet(dec_params)
    tx = make_optimizer({"lr": 1e-4})
    state = TrainState.create({"encoder": enc_params, "shift": shift_params},
                              tx)
    train_step = make_representation_train_step(gd, encoder, decoder, tx,
                                                remat=args.remat)

    key = jax.random.PRNGKey(0)
    x_0 = jax.random.normal(key, (B, args.size, args.size, 3), jnp.float32)

    # cost analysis of the single step (the honest GF/step figure)
    flops = None
    try:
        cost = jax.jit(train_step).lower(
            state, frozen, x_0, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    from functools import partial

    @partial(jax.jit, static_argnames="K", donate_argnums=0)
    def multi(state, frozen, x_0, rng, K):
        def body(carry, k):
            s, _ = carry
            s, loss = train_step(s, frozen, x_0, jax.random.fold_in(rng, k))
            return (s, loss), None
        (s, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                    jnp.arange(K))
        return s, loss

    times = {}
    for k in (args.k_lo, args.k_hi):
        state, loss = multi(state, frozen, x_0, key, K=k)  # compile+warm
        float(loss)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, loss = multi(state, frozen, x_0, key, K=k)
            float(loss)   # force completion
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[k] = best

    if args.trace:
        jax.profiler.start_trace(args.trace)
        state, loss = multi(state, frozen, x_0, key, K=args.k_lo)
        float(loss)
        jax.profiler.stop_trace()
        try:
            import summarize_trace
            summary = summarize_trace.summarize(args.trace)
            summarize_trace.print_report(summary, top=30, file=sys.stderr)
        except Exception as e:
            print(f"trace summary failed: {e}", file=sys.stderr)

    step_s = (times[args.k_hi] - times[args.k_lo]) / (args.k_hi - args.k_lo)
    out = {
        "size": args.size, "batch": B, "remat": args.remat,
        "gn_vjp": args.gn_vjp if args.gn_vjp != "auto"
        else ("on" if ops.use_gn_train_vjp() else "off"),
        "ms_per_step": round(step_s * 1e3, 2),
        "steps_per_sec": round(1.0 / step_s, 2),
        "imgs_per_sec": round(B / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 1) if flops else None,
    }
    if flops:
        peak = 197e12 if args.dtype == "bfloat16" else None
        if peak:
            out["achieved_tflops"] = round(flops / step_s / 1e12, 1)
            out["mfu_pct"] = round(100 * flops / step_s / peak, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
