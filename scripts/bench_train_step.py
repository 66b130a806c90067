#!/usr/bin/env python
"""Honest train-step timing: K scanned steps, slope between two K values.

Per-dispatch timing through the TPU tunnel carries a ~25 ms fixed
round-trip plus +/-30% jitter under host load (CLAUDE.md); scanning K
serially-dependent full train steps inside ONE program and taking the
slope between two K values removes both.  MFU comes from XLA
cost_analysis of the single compiled step (no scan inside it, so no
under-count).

``measure_train_step`` is the library entry point ``bench.py`` uses for
its train points (shared code => identical programs => the driver's
bench run hits the persistent compile cache warmed in-session).

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

PEAK_BF16_TFLOPS = 197e12   # v5e; bench.py passes its own peak


def measure_train_step(size: int, batch: int, remat=False,
                       dtype_name: str = "bfloat16", k_lo: int = 2,
                       k_hi: int = 8, reps: int = 3, trace: str = None,
                       peak_flops: float = PEAK_BF16_TFLOPS,
                       xla_options: dict = None,
                       num_iters: int = 1) -> dict:
    """Measure the flagship representation-learning train step.

    Returns {ms_per_step, steps_per_sec, imgs_per_sec, gflops_per_step,
    achieved_tflops, mfu_pct, ...}."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM
    from pdae_tpu import ops
    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import ShiftUNet, encoder_for_resolution
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    geometry = CELEBA64_DPM if size == 64 else FFHQ128_DPM

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    decoder = ShiftUNet(latent_dim=512, dtype=dtype, **geometry)
    encoder = encoder_for_resolution(size, 512, dtype=dtype)
    x1 = jnp.zeros((1, size, size, 3), jnp.float32)
    enc_params = jax.jit(encoder.init)(init_key(0), x1)["params"]
    dec_params = jax.jit(decoder.init)(
        init_key(1), x1, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 512)))["params"]
    shift_params, frozen = split_shift_unet(dec_params)
    tx = make_optimizer({"lr": 1e-4})
    state = TrainState.create({"encoder": enc_params, "shift": shift_params},
                              tx)
    train_step = make_representation_train_step(gd, encoder, decoder, tx,
                                                remat=remat,
                                                num_iters=num_iters)

    key = jax.random.PRNGKey(0)
    x_0 = jax.random.normal(key, (batch, size, size, 3), jnp.float32)

    # cost analysis of the single step (the honest GF/step figure).
    # Microbatched steps wrap the forwards in a lax.scan, whose body XLA
    # cost_analysis counts ONCE -- so the FLOPs reference is always the
    # unsplit (num_iters=1) step: same math, scan-free.
    flops_step = (train_step if num_iters <= 1 else
                  make_representation_train_step(gd, encoder, decoder, tx,
                                                 remat=remat))
    flops = None
    try:
        cost = jax.jit(flops_step).lower(
            state, frozen, x_0, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    from functools import partial

    # TPU-backend XLA options ride PJRT compiler_options (XLA_FLAGS can't
    # carry libtpu flags through the axon tunnel: the local parser only
    # knows CPU-backend flags and aborts on unknown ones)
    jit_kw = {"compiler_options": xla_options} if xla_options else {}

    @partial(jax.jit, static_argnames="K", donate_argnums=0, **jit_kw)
    def multi(state, frozen, x_0, rng, K):
        def body(carry, k):
            s, _ = carry
            s, loss = train_step(s, frozen, x_0, jax.random.fold_in(rng, k))
            return (s, loss), None
        (s, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                    jnp.arange(K))
        return s, loss

    times = {}
    for k in (k_lo, k_hi):
        state, loss = multi(state, frozen, x_0, key, K=k)  # compile+warm
        float(loss)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            state, loss = multi(state, frozen, x_0, key, K=k)
            float(loss)   # force completion
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[k] = best

    if trace:
        jax.profiler.start_trace(trace)
        state, loss = multi(state, frozen, x_0, key, K=k_lo)
        float(loss)
        jax.profiler.stop_trace()
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import summarize_trace
            summary = summarize_trace.summarize(trace)
            summarize_trace.print_report(summary, top=30, file=sys.stderr)
        except Exception as e:
            print(f"trace summary failed: {e}", file=sys.stderr)

    step_s = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    out = {
        "size": size, "batch": batch, "remat": remat,
        "num_iters": num_iters,
        "gn_vjp": "on" if ops.use_gn_train_vjp() else "off",
        # report what the measured program actually traced: under the
        # auto gate the per-iter batch decides (microbatching shrinks it)
        "fused_upsample": ("on" if ops.use_fused_upsample(
            batch // max(num_iters or 1, 1)) else "off"),
        "ms_per_step": round(step_s * 1e3, 2),
        "steps_per_sec": round(1.0 / step_s, 2),
        "imgs_per_sec": round(batch / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 1) if flops else None,
    }
    if flops and peak_flops and dtype_name == "bfloat16":
        out["achieved_tflops"] = round(flops / step_s / 1e12, 1)
        out["mfu_pct"] = round(100 * flops / step_s / peak_flops, 1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=64, choices=[64, 128])
    p.add_argument("--remat", nargs="?", const="full", default="off",
                   choices=["off", "full", "skips"],
                   help="checkpoint the decoder fwd (128px train config): "
                        "full = recompute everything; skips = save the "
                        "trunk skip activations (steps.py::remat_wrap)")
    p.add_argument("--gn_vjp", default="auto", choices=["auto", "on", "off"],
                   help="stat-caching closed-form GN backward (ops)")
    p.add_argument("--fused_upsample", default="auto",
                   choices=["auto", "on", "off"],
                   help="up-blocks' conv3x3(nearest_up) as one lhs-dilated "
                        "conv (ops/upsample_conv.py)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k_lo", type=int, default=2)
    p.add_argument("--k_hi", type=int, default=8)
    p.add_argument("--reps", type=int, default=3,
                   help="slope samples (min taken)")
    p.add_argument("--platform", default=None)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="jax.profiler trace of a few steps into DIR + "
                        "top-op summary to stderr")
    p.add_argument("--xla_option", action="append", default=[],
                   metavar="KEY=VAL",
                   help="repeatable XLA compiler option passed via PJRT "
                        "compiler_options (e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=65536)")
    p.add_argument("--microbatch", type=int, default=1, metavar="M",
                   help="split the batch into M grad-accumulation "
                        "micro-batches inside the step (the trainer's "
                        "num_iterations; shrinks each conv wgrad's "
                        "spatial-reduce extent)")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        root, ".jax_cache"))

    if args.gn_vjp != "auto":
        from pdae_tpu import ops
        ops.set_gn_train_vjp(args.gn_vjp == "on")
    if args.fused_upsample != "auto":
        from pdae_tpu import ops
        ops.set_fused_upsample(args.fused_upsample == "on")

    remat = {"off": False, "full": True, "skips": "skips"}[args.remat]
    xla_options = (dict(kv.split("=", 1) for kv in args.xla_option)
                   or None)
    out = measure_train_step(args.size, args.batch, remat=remat,
                             dtype_name=args.dtype, k_lo=args.k_lo,
                             k_hi=args.k_hi, reps=args.reps,
                             trace=args.trace, xla_options=xla_options,
                             num_iters=args.microbatch)
    if xla_options:
        out["xla_options"] = xla_options
    print(json.dumps(out))


if __name__ == "__main__":
    main()
