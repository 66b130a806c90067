#!/usr/bin/env python
"""Benchmark: PDAE throughput + MFU on one TPU chip.

Default run produces the complete BASELINE.json metric set in ONE JSON line:
  * DDIM-100 sampling imgs/sec/chip through the flagship ShiftUNet decoder
    at 64px (celeba64 geometry) AND 128px (ffhq geometry), batch-swept,
    peak reported
  * PDAE representation-learning train step: steps/sec/chip + imgs/sec
    at 64px (fwd+bwd+adam+EMA as one jitted program)
  * per-eval FLOPs (XLA cost analysis of a single model apply -- NB XLA
    counts a lax.scan body once, so loop FLOPs = per-eval * steps),
    achieved TFLOP/s, and MFU vs the chip's bf16 peak

``vs_baseline`` compares the TPU-native execution model (whole DDIM loop
fused into one XLA program via lax.scan) against the reference's execution
model (one host-driven model dispatch per timestep with a host sync each
step, as in /root/reference/diffusion/ddim.py:57-63) running the SAME
jitted model on the SAME chip.  That isolates the framework-design win from
the hardware.  The reference repo publishes no throughput numbers
(BASELINE.md), so ours are self-substantiating: see PERF.md for the
profile-backed roofline analysis.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts"))

# bf16 matmul peak by TPU generation (TFLOP/s per chip)
PEAK_BF16_TFLOPS = {
    "v5 lite": 197.0,   # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,   # v6e / Trillium
    "v6e": 918.0,
}


def chip_peak_tflops(device_str: str):
    s = device_str.lower()
    for key, peak in PEAK_BF16_TFLOPS.items():
        if key in s:
            return peak
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny model + few steps (CI smoke)")
    p.add_argument("--platform", default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--batches64", default="16,32",
                   help="default trimmed for driver wall-clock; the full\n                   batch sweep (16,32,64) is recorded in PERF.md")
    p.add_argument("--batches128", default="8")
    p.add_argument("--train_batch", type=int, default=32,
                   help="per-chip train batch for the legacy --train_scan "
                        "dispatch-loop mode")
    p.add_argument("--train_batches64", default="32,64",
                   help="64px train-step batch sweep (best reported)")
    p.add_argument("--train_batches128", default="32,64",
                   help="128px (ffhq geometry) train-step batch sweep "
                        "(best reported; both fit in HBM, PERF.md)")
    p.add_argument("--remat128", default="off",
                   choices=["off", "full", "skips"],
                   help="128px train remat mode (off is fastest on v5e "
                        "since the GN VJP made the no-remat backward "
                        "compile-feasible, PERF.md; full/skips trade "
                        "throughput for activation memory)")
    p.add_argument("--skip_128", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_train_128", action="store_true")
    p.add_argument("--skip_stage34", action="store_true",
                   help="skip the latent-DPM + manipulation train-step "
                        "points (stages 3-4; MLP-sized, seconds of chip "
                        "time)")
    p.add_argument("--stage34_batch", type=int, default=128,
                   help="per-chip batch for the stage-3/4 points (configs "
                        "ship 128)")
    p.add_argument("--skip_latency", action="store_true",
                   help="skip the batch-1 DDIM-100 serving-latency point")
    p.add_argument("--dpm_steps", type=int, default=20,
                   help="NFE for the DPM-Solver++(2M) fast-decode points "
                        "(0 skips them)")
    p.add_argument("--train_scan", type=int, default=0, metavar="K",
                   help="also bench K train steps scanned into one XLA "
                        "program (runner_config.steps_per_dispatch; "
                        "opt-in: the scan program is a separate ~10min "
                        "cold compile over the tunnel)")
    p.add_argument("--skip_host_baseline", action="store_true")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the headline "
                        "sampling program into DIR and print the top-op "
                        "summary to stderr (stdout stays one JSON line)")
    p.add_argument("--fused_upsample", default="auto",
                   choices=["auto", "on", "off"],
                   help="up-blocks' conv3x3(nearest_up) as one lhs-dilated "
                        "conv (ops/upsample_conv.py; auto = on for TPU)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from pdae_tpu import ops
    if args.fused_upsample != "auto":
        ops.set_fused_upsample(args.fused_upsample == "on")

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM, TINY_DPM
    from pdae_tpu.diffusion import (GaussianDiffusion, ddim as ddim_lib,
                                    dpm_solver as dpm_lib)
    from pdae_tpu.models import ShiftUNet
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    steps = 10 if args.quick else args.ddim_steps
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.ddim_schedule(f"ddim{steps}")
    device = str(jax.devices()[0])
    peak = chip_peak_tflops(device) if args.dtype == "bfloat16" else None

    def build(geometry, latent_dim, size, batch):
        model = ShiftUNet(latent_dim=latent_dim, dtype=dtype, **geometry)
        x = jnp.zeros((batch, size, size, geometry["input_channel"]),
                      jnp.float32)
        t = jnp.zeros((batch,), jnp.int32)
        z = jnp.zeros((batch, latent_dim), jnp.float32)
        params = jax.jit(model.init)(init_key(0), x, t, z)["params"]
        return model, params, x, t, z

    def eval_flops(model, params, x, t, z):
        """XLA's flop count for ONE model apply (scan bodies are counted
        once by cost_analysis, so this is the honest per-eval figure)."""
        f = jax.jit(lambda p, xx, tt, zz: model.apply({"params": p},
                                                      xx, tt, zz))
        try:
            cost = f.lower(params, x, t, z).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            fl = float(cost.get("flops", 0.0))
            # None (not NaN) keeps the output line valid JSON when the
            # backend doesn't support cost analysis
            return fl if fl > 0 else None
        except Exception:
            return None

    def bench_sample(geometry, latent_dim, size, batch, reps,
                     solver_steps=None):
        """Time one full decode; ``solver_steps`` switches the loop from
        DDIM-`steps` to DPM-Solver++(2M) with that many evals (the fast
        serving path, diffusion/dpm_solver.py)."""
        model, params, x, t, z = build(geometry, latent_dim, size, batch)

        if solver_steps:
            tables = gd.solver_tables(f"dpm{solver_steps}")
            n_evals = int(tables.num_steps)

            @jax.jit
            def fused(p, x_T, zz):
                dec = lambda xx, tt, zz_: model.apply({"params": p},
                                                      xx, tt, zz_)
                return dpm_lib.shift_dpm_solver_sample_loop(
                    tables, dec, zz, x_T)
        else:
            n_evals = steps

            @jax.jit
            def fused(p, x_T, zz):
                dec = lambda xx, tt, zz_: model.apply({"params": p},
                                                      xx, tt, zz_)
                return ddim_lib.shift_ddim_sample_loop(dds, dec, zz, x_T)

        key = jax.random.PRNGKey(0)
        x_T = jax.random.normal(key, x.shape)
        zz = jax.random.normal(key, z.shape)
        jax.block_until_ready(fused(params, x_T, zz))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fused(params, x_T, zz)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        fl = eval_flops(model, params, x, t, z)
        achieved_tf = fl * n_evals / dt / 1e12 if fl else None
        return {
            "batch": batch,
            "imgs_per_sec": round(batch / dt, 3),
            "denoise_steps_per_sec": round(batch * n_evals / dt, 1),
            "eval_gflops": round(fl / 1e9, 1) if fl else None,
            "achieved_tflops": round(achieved_tf, 1) if achieved_tf else None,
            "mfu_pct": (round(100 * achieved_tf / peak, 1)
                        if peak and achieved_tf else None),
            "model": model, "params": params,
            "x_T": x_T, "z": zz, "fused": fused,
        }

    def bench_host_loop(r, size, batch):
        """Reference execution model: one jitted dispatch per step with a
        host sync each step (like torch ddim.py:57-63 + .item())."""
        model, params = r["model"], r["params"]

        @jax.jit
        def one_step(p, xx, i, zz):
            tt = jnp.full((batch,), 0, jnp.int32) + dds.timestep_map[i]
            eps, g = model.apply({"params": p}, xx, tt, zz)
            coef = dds.sqrt_one_minus_alphas_cumprod[i]
            eps = eps - coef * g
            sr = dds.sqrt_recip_alphas_cumprod[i]
            srm1 = dds.sqrt_recip_alphas_cumprod_m1[i]
            x0 = jnp.clip(sr * xx - srm1 * eps, -1, 1)
            new_eps = (sr * xx - x0) / srm1
            ap = dds.alphas_cumprod_prev[i]
            return x0 * jnp.sqrt(ap) + jnp.sqrt(1 - ap) * new_eps

        host_steps = min(steps, 10)
        jax.block_until_ready(
            one_step(params, r["x_T"], jnp.int32(steps), r["z"]))
        t0 = time.perf_counter()
        xx = r["x_T"]
        for i in range(steps, steps - host_steps, -1):
            xx = one_step(params, xx, jnp.int32(i), r["z"])
            np.asarray(xx[0, 0, 0, 0])   # host sync per step, like .item()
        host_dt = (time.perf_counter() - t0) * (steps / host_steps)
        return round(batch / host_dt, 3)

    def bench_train(geometry, latent_dim, size, batch, n_steps):
        import optax  # noqa: F401 (state.make_optimizer uses it)
        from pdae_tpu.models import encoder_for_resolution
        from pdae_tpu.models.encoder import SemanticEncoder
        from pdae_tpu.training.partition import split_shift_unet
        from pdae_tpu.training.state import TrainState, make_optimizer
        from pdae_tpu.training.steps import make_representation_train_step

        model, params, x, t, z = build(geometry, latent_dim, size, batch)
        encoder = (encoder_for_resolution(size, latent_dim)
                   if size in (64, 128)
                   else SemanticEncoder(latent_dim, channels=(8, 16),
                                        attn_after_stage=2))
        enc_params = jax.jit(encoder.init)(init_key(2), x)["params"]
        shift_params, frozen = split_shift_unet(params)
        tx = make_optimizer({"lr": 1e-4})
        state = TrainState.create(
            {"encoder": enc_params, "shift": shift_params}, tx)

        # the SHARED step builder (training/steps.py) -- the bench measures
        # the same program structure the real trainer runs
        train_step = make_representation_train_step(gd, encoder, model, tx)
        step = jax.jit(train_step, donate_argnums=0)
        key = jax.random.PRNGKey(0)
        x_0 = jax.random.normal(key, x.shape)
        keys = jax.random.split(key, n_steps + 3)
        for i in range(3):  # warm compile + steady-state donation
            state, loss = step(state, frozen, x_0, keys[i])
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, loss = step(state, frozen, x_0, keys[3 + i])
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / n_steps
        out = {"steps_per_sec": round(1.0 / dt, 3),
               "imgs_per_sec": round(batch / dt, 1),
               "batch": batch}

        if args.train_scan > 1:
            # runner_config.steps_per_dispatch equivalent: K steps in ONE
            # program (removes the per-step dispatch gap, PERF.md)
            from functools import partial
            K = args.train_scan

            @partial(jax.jit, donate_argnums=0)
            def multi(state, frozen, xs, rngs):
                def body(s, inp):
                    xb, kk = inp
                    return train_step(s, frozen, xb, kk)
                return jax.lax.scan(body, state, (xs, rngs))

            xs = jax.random.normal(key, (K,) + x_0.shape)
            rngs = jax.random.split(jax.random.PRNGKey(1), K)
            n_chunks = max(2, n_steps // K)
            for _ in range(2):
                state, loss = multi(state, frozen, xs, rngs)
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                state, loss = multi(state, frozen, xs, rngs)
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / (n_chunks * K)
            out["scan_k"] = K
            out["scan_steps_per_sec"] = round(1.0 / dt, 3)
            out["scan_imgs_per_sec"] = round(batch / dt, 1)
        return out

    def capture_trace(r):
        """Trace one rep of the headline sampling program; summary to
        stderr so stdout stays one JSON line.  Never raises: a trace
        failure must not discard the measured result (callers print the
        JSON line after this)."""
        try:
            _capture_trace(r)
        except Exception as e:
            print(f"[trace capture failed: {e!r}]", file=sys.stderr)

    def _capture_trace(r):
        jax.profiler.start_trace(args.trace)
        jax.block_until_ready(r["fused"](r["params"], r["x_T"], r["z"]))
        jax.profiler.stop_trace()
        from summarize_trace import print_report, summarize
        summary = summarize(args.trace)
        device_lanes = {k: v for k, v in summary.items()
                        if k.lower().startswith("/device")}
        print_report(device_lanes or summary, top=10, file=sys.stderr)
        print(f"\n[trace written to {args.trace}; full table: "
              f"python scripts/summarize_trace.py {args.trace}]",
              file=sys.stderr)

    if args.quick:
        r = bench_sample(TINY_DPM, 16, 16, 8, reps=1)
        host = (None if args.skip_host_baseline
                else bench_host_loop(r, 16, 8))
        if args.trace:
            capture_trace(r)
        result = {
            "metric": f"ddim{steps}_imgs_per_sec_16px_tiny",
            "value": r["imgs_per_sec"],
            "unit": "imgs/sec/chip",
            "vs_baseline": (round(r["imgs_per_sec"] / host, 3)
                            if host else None),
            "quick": True,
            "dtype": args.dtype,
            "device": device,
        }
        print(json.dumps(result))
        return

    reps = 2
    sweep64 = []
    for b in [int(v) for v in args.batches64.split(",")]:
        r = bench_sample(CELEBA64_DPM, 512, 64, b, reps)
        sweep64.append(r)
    best64 = max(sweep64, key=lambda r: r["imgs_per_sec"])
    host_imgs = (None if args.skip_host_baseline
                 else bench_host_loop(best64, 64, best64["batch"]))

    sweep128 = []
    if not args.skip_128:
        for b in [int(v) for v in args.batches128.split(",")]:
            sweep128.append(bench_sample(FFHQ128_DPM, 512, 128, b, reps))
    best128 = (max(sweep128, key=lambda r: r["imgs_per_sec"])
               if sweep128 else None)

    # train points: K scanned steps, slope between two K values -- the
    # honest device-time method (scripts/bench_train_step.py; dispatch
    # idle and the ~25ms tunnel round-trip cancel in the slope).  The
    # legacy dispatch-loop path remains behind --train_scan (it exists to
    # SHOW the dispatch gap steps_per_dispatch removes).
    train64 = train128 = None
    if not args.skip_train:
        from bench_train_step import measure_train_step
        peak_fl = peak * 1e12 if peak else None
        sweep = [measure_train_step(64, b, peak_flops=peak_fl)
                 for b in [int(v)
                           for v in args.train_batches64.split(",")]]
        best_t = max(sweep, key=lambda r: r["imgs_per_sec"])
        train64 = dict(best_t)
        train64["sweep"] = sweep
        if not args.skip_train_128:
            remat128 = {"off": False, "full": True,
                        "skips": "skips"}[args.remat128]
            sweep128t = [measure_train_step(128, b, remat=remat128,
                                            peak_flops=peak_fl)
                         for b in [int(v)
                                   for v in args.train_batches128.split(",")]]
            train128 = dict(max(sweep128t, key=lambda r: r["imgs_per_sec"]))
            train128["sweep"] = sweep128t
        if args.train_scan > 1:
            legacy = bench_train(CELEBA64_DPM, 512, 64, args.train_batch,
                                 n_steps=12)
            (train64 or {}).update(
                {"dispatch_loop": {k: legacy[k] for k in
                                   ("steps_per_sec", "imgs_per_sec",
                                    "batch")},
                 "scan_k": legacy.get("scan_k"),
                 "scan_steps_per_sec": legacy.get("scan_steps_per_sec"),
                 "scan_imgs_per_sec": legacy.get("scan_imgs_per_sec")})

    # stages 3-4: latent-DPM (MLPSkipNet) + manipulation (Linear 512x40)
    # train steps at the shipped config geometries -- the remaining two of
    # the four trainer stages (reference train_latent_diffusion.py:72-93,
    # train_manipulation.py:31-38); slope-timed, seconds of chip time
    train_latent = train_manip = None
    if not args.skip_stage34:
        from bench_stage34 import (measure_latent_step,
                                   measure_manipulation_step)
        peak_fl = peak * 1e12 if peak else None
        train_latent = measure_latent_step(args.stage34_batch,
                                           peak_flops=peak_fl)
        train_manip = measure_manipulation_step(args.stage34_batch,
                                                peak_flops=peak_fl)

    # serving latency: ONE image through the whole DDIM-100 decode (the
    # batch-1 regime the resident service lives in; throughput numbers
    # above can't be divided down to this -- the chip is underutilized
    # at b1, so it must be measured)
    latency_b1_ms = None
    if not args.skip_latency:
        r1 = bench_sample(CELEBA64_DPM, 512, 64, 1, reps=4)
        latency_b1_ms = round(1000.0 / r1["imgs_per_sec"], 1)

    # fast decode: DPM-Solver++(2M) at ~5x fewer NFE through the same
    # decoder (diffusion/dpm_solver.py) -- throughput at the best 64px
    # batch + the batch-1 serving latency it unlocks
    dpm_point = dpm_point128 = dpm_latency_b1_ms = None
    if args.dpm_steps:
        dpm_point = bench_sample(CELEBA64_DPM, 512, 64, best64["batch"],
                                 reps, solver_steps=args.dpm_steps)
        if not args.skip_latency:
            r1 = bench_sample(CELEBA64_DPM, 512, 64, 1, reps=4,
                              solver_steps=args.dpm_steps)
            dpm_latency_b1_ms = round(1000.0 / r1["imgs_per_sec"], 1)
        if best128:
            dpm_point128 = bench_sample(FFHQ128_DPM, 512, 128,
                                        best128["batch"], reps,
                                        solver_steps=args.dpm_steps)

    # fast AUTOENCODE: dpm<N> encode (inversion on the reversed lambda
    # grid) + dpm<N> decode through the same ShiftUNet -- the
    # autoencoding_eval pattern (reference: ddim1000 encode + ddim100
    # decode = 1100 chained evals) at 2N evals.  The semantic-encoder
    # forward (~1 extra eval) is omitted, consistent with the decode
    # points above.
    ae_point = None
    if args.dpm_steps:
        n_ae = args.dpm_steps
        enc_tables = gd.solver_tables(f"dpm{n_ae}", direction="encode")
        dec_tables = gd.solver_tables(f"dpm{n_ae}")
        model, params, x, t, z = build(CELEBA64_DPM, 512, 64,
                                       best64["batch"])

        @jax.jit
        def ae_fused(p, x_0, zz):
            dec = lambda xx, tt, zz_: model.apply({"params": p}, xx, tt, zz_)
            x_T = dpm_lib.shift_dpm_solver_encode_loop(enc_tables, dec, zz,
                                                       x_0)
            return dpm_lib.shift_dpm_solver_sample_loop(dec_tables, dec, zz,
                                                        x_T)

        key = jax.random.PRNGKey(0)
        x_0 = jnp.tanh(jax.random.normal(key, x.shape))
        zz = jax.random.normal(key, z.shape)
        jax.block_until_ready(ae_fused(params, x_0, zz))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = ae_fused(params, x_0, zz)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        n_evals = int(enc_tables.num_steps) + int(dec_tables.num_steps)
        # the reference-pattern rate is DERIVED from the measured DDIM
        # evals/s (1100 chained evals), not separately timed
        ref_pattern = round(best64["denoise_steps_per_sec"] / 1100.0, 3)
        ae_point = {
            "batch": best64["batch"],
            "imgs_per_sec": round(best64["batch"] / dt, 3),
            "evals": n_evals,
            "ddim_pattern_imgs_per_sec_derived": ref_pattern,
            "speedup_vs_ddim_pattern": round(
                best64["batch"] / dt / ref_pattern, 1) if ref_pattern
            else None,
        }

    strip = lambda r: {k: v for k, v in r.items()
                       if k not in ("model", "params", "x_T", "z", "fused")}
    result = {
        "metric": f"ddim{steps}_imgs_per_sec_64px_shiftunet",
        "value": best64["imgs_per_sec"],
        "unit": "imgs/sec/chip",
        "vs_baseline": (round(best64["imgs_per_sec"] / host_imgs, 3)
                        if host_imgs else None),
        "denoise_steps_per_sec_per_chip": best64["denoise_steps_per_sec"],
        "mfu_pct": best64["mfu_pct"],
        "achieved_tflops": best64["achieved_tflops"],
        "eval_gflops": best64["eval_gflops"],
        "batch": best64["batch"],
        "dtype": args.dtype,
        "device": device,
        "peak_bf16_tflops": peak,
        # what the BATCHED programs traced under the auto gate (the b1
        # latency points in the same run trace unfused below batch 8 --
        # PERF.md "128px train breakdown")
        "fused_upsample": ops.use_fused_upsample(best64["batch"]),
        "host_loop_imgs_per_sec": host_imgs,
        "sweep_64px": [strip(r) for r in sweep64],
        "ddim100_128px": strip(best128) if best128 else None,
        "sweep_128px": [strip(r) for r in sweep128],
        "train_64px": train64,
        "train_128px": train128,
        "train_latent": train_latent,
        "train_manipulation": train_manip,
        "latency_b1_ms_ddim100_64px": latency_b1_ms,
        f"dpm{args.dpm_steps}_64px": (strip(dpm_point) if dpm_point
                                      else None),
        f"latency_b1_ms_dpm{args.dpm_steps}_64px": dpm_latency_b1_ms,
        f"dpm{args.dpm_steps}_128px": (strip(dpm_point128) if dpm_point128
                                       else None),
        f"autoencode_dpm{args.dpm_steps}_64px": ae_point,
        # the reference's README-headline eval program (ddim1000 encode +
        # ddim100 decode at ffhq128 geometry, autoencoding_eval.py):
        # imgs/s derived from the measured 128px DDIM evals/s over its
        # 1100 chained evals.  Directly-timed chip record (compile wall,
        # HBM temp, roundtrip SSIM/MSE): scripts/headline_eval.py +
        # PERF.md "Headline program @128px".
        "headline_ddim1000p100_128px_derived": (
            round(best128["denoise_steps_per_sec"] / 1100.0, 3)
            if best128 else None),
    }

    if args.trace:
        capture_trace(best64)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
