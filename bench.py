#!/usr/bin/env python
"""Benchmark: PDAE throughput + MFU on one TPU chip.

Timeout-proof by construction (round-5 rework; BENCH_r04 was empty because
a single end-of-run print sat behind a 25-40 min cold compile):

  * a COMPACT cumulative JSON line (< ~1.5 KB, headline 64px point first)
    is printed + flushed after EVERY completed section, so whatever the
    driver's timeout, the last parseable line in its output tail holds
    everything that finished;
  * the full per-section detail (batch sweeps, FLOP counts, scan slopes)
    goes to ``--detail_out`` (default records/bench_detail_last.json) --
    it no longer rides the stdout line, which must fit a 2000-char tail;
  * SIGTERM/SIGINT print the partial result before dying (``timeout``
    sends SIGTERM).  A Python signal handler alone is NOT enough: while
    the main thread is blocked inside a native XLA/PJRT call (tunnel
    compile, or a hung device execute) CPython defers handlers
    indefinitely -- so a ``signal.set_wakeup_fd`` watchdog THREAD emits
    the partial line and hard-exits, and the same thread enforces
    ``budget_s + 600`` as a hard deadline for hangs with no external
    signal.  The partial line names the stuck section (``in_progress``);
  * ``--budget_s`` (env BENCH_BUDGET_S, default 1800) skips remaining
    sections once the wall-clock budget is spent, marking them
    ``skipped: budget``, so the FINAL line still prints before any driver
    timeout fires;
  * every section runs under try/except -- one failed section records an
    error string instead of killing the run.

Wall-clock (measured round 5, this host over the tunnel): warm full suite
844 s (12/12 sections, records/bench_r05_full_suite.json); cold 64px
headline alone 245-540 s depending on host load; full cold 25-40 min.
A clean checkout is NOT fully cold: the committed cache seed
(records/jax_cache_seed/, ~52 MB, copied into .jax_cache at startup)
makes the headline section warm -- measured: `timeout 300 python
bench.py` from a clean cache captured the 64px headline + host baseline
+ the 128px point before the timeout.  The budget default covers the
warm suite with margin.

Metrics (same set as BASELINE.json):
  * DDIM-100 sampling imgs/sec/chip through the flagship ShiftUNet decoder
    at 64px (celeba64 geometry) AND 128px (ffhq geometry), batch-swept
  * PDAE representation-learning train step at 64/128px (fwd+bwd+adam+EMA
    as one jitted program), stage-3/4 train steps, batch-1 latencies,
    DPM-Solver++(2M) fast decode + fast autoencode
  * per-eval FLOPs (XLA cost analysis of ONE model apply -- lax.scan
    bodies are counted once, so loop FLOPs = per-eval * steps), achieved
    TFLOP/s, MFU vs the chip's bf16 peak

``vs_baseline`` compares the TPU-native execution model (whole DDIM loop
fused into one XLA program via lax.scan) against the reference's execution
model (one host-driven model dispatch per timestep with a host sync each
step, as in /root/reference/diffusion/ddim.py:57-63) running the SAME
jitted model on the SAME chip.  That isolates the framework-design win
from the hardware.  The reference repo publishes no throughput numbers
(BASELINE.md), so ours are self-substantiating: see PERF.md for the
profile-backed roofline analysis.
"""

import argparse
import json
import os
import select
import signal
import sys
import threading
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


class Emitter:
    """Cumulative result stream: compact JSON line per completed section
    on stdout (the driver keeps only a ~2KB output tail -- every line must
    fit it whole), full detail mirrored to a JSON file."""

    def __init__(self, detail_path: str, budget_s: float):
        self.compact = {}      # the stdout line, insertion-ordered
        self.detail = {}       # the file, unabridged
        self.done = []
        self.skipped = {}
        self.detail_path = detail_path
        self.t0 = time.perf_counter()
        self.budget_s = budget_s
        self._finalized = False
        self.current = None      # section running right now (hang forensics)
        self._emit_lock = threading.Lock()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def over_budget(self) -> bool:
        return self.budget_s and self.elapsed() > self.budget_s

    def section(self, name: str) -> bool:
        """Gate a section on the wall budget; False = skip (recorded)."""
        if self.over_budget():
            self.skipped[name] = "budget"
            return False
        self.current = name
        return True

    def fail(self, name: str, err: BaseException):
        self.skipped[name] = f"error: {type(err).__name__}: {err}"[:160]
        if self.current == name:
            self.current = None
        print(f"[bench] section {name} failed: {err!r}", file=sys.stderr)

    def emit(self, final: bool = False):
        with self._emit_lock:
            line = dict(self.compact)
            line["done"] = self.done
            if self.skipped:
                line["skipped"] = self.skipped
            if self.current and self.current not in self.done:
                # names the section that was RUNNING when this line printed
                # -- on a partial line after a signal/deadline, this is the
                # hang/timeout culprit (e.g. a dead device tunnel)
                line["in_progress"] = self.current
            line["partial"] = not final
            line["elapsed_s"] = round(self.elapsed(), 1)
            line["detail"] = self.detail_path
            self.detail.update(line)
            try:
                d = os.path.dirname(self.detail_path)
                if d:
                    os.makedirs(d, exist_ok=True)
                tmp = self.detail_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(self.detail, f, indent=1)
                os.replace(tmp, self.detail_path)
            except OSError as e:
                print(f"[bench] detail write failed: {e}", file=sys.stderr)
            print(json.dumps(line), flush=True)

    def finish(self, name: str):
        self.done.append(name)
        if self.current == name:
            self.current = None
        self.emit()

    def _die_with_partial(self, why: str):
        if self._finalized:
            os._exit(1)
        self._finalized = True
        self.skipped["_signal"] = why
        try:
            self.emit(final=False)
        finally:
            os._exit(1)

    def install_signal_handlers(self):
        def handler(signum, frame):
            self._die_with_partial(signal.Signals(signum).name)
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass
        # The handler above only runs when the main thread executes Python
        # bytecode -- while it is blocked inside a native XLA/PJRT call (a
        # tunnel compile or a HUNG device execute, the exact BENCH_r04
        # failure mode) CPython defers it indefinitely.  Two fd-level
        # backstops that need no main-thread cooperation:
        #   * signal.set_wakeup_fd writes the signum byte the instant the
        #     signal is DELIVERED; a daemon thread selects on the pipe,
        #     prints the cumulative partial line, and hard-exits;
        #   * the same thread enforces budget_s + grace as a hard deadline,
        #     so a hang with no external signal still yields an artifact.
        try:
            rfd, wfd = os.pipe()
            os.set_blocking(wfd, False)
            signal.set_wakeup_fd(wfd, warn_on_full_buffer=False)
        except (ValueError, OSError, AttributeError):
            return

        def watch():
            # grace covers one legitimately-long in-flight section (a cold
            # tunnel compile is 5-10 min) before the hard stop
            deadline = self.budget_s + 600.0 if self.budget_s else None
            while True:
                timeout = None
                if deadline is not None:
                    timeout = deadline - self.elapsed()
                    if timeout <= 0:
                        self._die_with_partial("deadline: budget_s + 600")
                try:
                    ready, _, _ = select.select([rfd], [], [], timeout)
                except OSError:
                    return
                if not ready:
                    continue
                try:
                    data = os.read(rfd, 64)
                except OSError:
                    return
                if any(b in (signal.SIGTERM, signal.SIGINT) for b in data):
                    self._die_with_partial("SIGTERM/SIGINT (fd watchdog)")

        threading.Thread(target=watch, daemon=True, name="emit-watchdog")\
            .start()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny model + few steps (CI smoke)")
    p.add_argument("--platform", default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--batches64", default="16",
                   help="default trimmed to the single peak point: "
                        "throughput is FLAT in batch from 16 up "
                        "(PERF.md round-2 sweep; 16,32,64 recorded "
                        "there), and every extra batch is another "
                        "multi-minute cold compile in a driver run")
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
                        "summary to stderr (stdout stays JSON lines)")
    p.add_argument("--fused_upsample", default="auto",
                   choices=["auto", "on", "off"],
                   help="up-blocks' conv3x3(nearest_up) as one lhs-dilated "
                        "conv (ops/upsample_conv.py; auto = on for TPU)")
    p.add_argument("--budget_s", type=float,
                   default=float(os.environ.get("BENCH_BUDGET_S", "1800")),
                   help="wall-clock budget; sections not started before it "
                        "expires are skipped and marked, so the final JSON "
                        "line always prints (default 1800, env "
                        "BENCH_BUDGET_S)")
    p.add_argument("--detail_out",
                   default=os.path.join("records", "bench_detail_last.json"),
                   help="full per-section detail JSON (the stdout lines "
                        "stay compact so they fit the driver's output tail)")
    p.add_argument("--cache_dir",
                   default=os.environ.get("BENCH_CACHE_DIR"),
                   help="override the persistent compile-cache dir "
                        "(default .jax_cache next to this file; point at "
                        "an empty dir to measure the cold-compile wall "
                        "without discarding the warm cache)")
    args = p.parse_args()

    em = Emitter(args.detail_out, args.budget_s)
    em.install_signal_handlers()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    here = os.path.dirname(os.path.abspath(__file__))
    cache_dir = args.cache_dir or os.path.join(here, ".jax_cache")
    # seed the persistent cache with the committed headline-program
    # entries (records/jax_cache_seed/): a clean checkout has no
    # .jax_cache (gitignored, GBs), so a driver cold run used to spend
    # ~4-10 min compiling before the FIRST data point could print.
    # NB the cache key is path-sensitive in this environment (measured:
    # entries built under a different cache dir never hit), so the seed
    # was built at the default <repo>/.jax_cache path -- it only helps
    # the default invocation from this repo location, which is exactly
    # the driver's.
    seed_dir = os.path.join(here, "records", "jax_cache_seed")
    if os.path.isdir(seed_dir):
        import shutil
        os.makedirs(cache_dir, exist_ok=True)
        for name in os.listdir(seed_dir):
            dst = os.path.join(cache_dir, name)
            if not os.path.exists(dst):
                try:
                    shutil.copy2(os.path.join(seed_dir, name), dst)
                except OSError as e:
                    print(f"[bench] cache seed copy failed: {e}",
                          file=sys.stderr)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

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

    # --- section: device canary -- the FIRST device round-trip of the run
    # (tiny matmul, sub-second compile even over the tunnel).  Purpose is
    # forensics, not perf: the very first emitted line proves the device
    # executes, and if the tunnel is hung (observed in-env: execute RPC
    # never answers while compile RPC works) the watchdog's partial line
    # says in_progress=device_canary instead of an empty artifact. --------
    device = str(jax.devices()[0])
    if em.section("device_canary"):
        try:
            t0 = time.perf_counter()
            a = jnp.ones((256, 256), jnp.float32)
            jax.block_until_ready(a @ a)
            em.compact["canary_ms"] = round(
                (time.perf_counter() - t0) * 1e3, 1)
            em.compact["device"] = device
            em.finish("device_canary")
        except Exception as e:
            em.fail("device_canary", e)

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.ddim_schedule(f"ddim{steps}")
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
        import numpy as np
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

    def bench_train_dispatch_loop(geometry, latent_dim, size, batch,
                                  n_steps):
        """Legacy per-step dispatch loop + optional K-step scan; exists to
        SHOW the dispatch gap steps_per_dispatch removes (--train_scan)."""
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
        stderr so stdout stays JSON lines.  Never raises: a trace failure
        must not discard the measured result."""
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

    strip = lambda r: {k: v for k, v in r.items()
                       if k not in ("model", "params", "x_T", "z", "fused")}

    if args.quick:
        r = bench_sample(TINY_DPM, 16, 16, 8, reps=1)
        host = (None if args.skip_host_baseline
                else bench_host_loop(r, 16, 8))
        if args.trace:
            capture_trace(r)
        em.compact.update({
            "metric": f"ddim{steps}_imgs_per_sec_16px_tiny",
            "value": r["imgs_per_sec"],
            "unit": "imgs/sec/chip",
            "vs_baseline": (round(r["imgs_per_sec"] / host, 3)
                            if host else None),
            "quick": True,
            "dtype": args.dtype,
            "device": device,
        })
        em.done.append("quick")
        em.emit(final=True)
        return

    em.compact.update({
        "metric": f"ddim{steps}_imgs_per_sec_64px_shiftunet",
        "value": None,
        "unit": "imgs/sec/chip",
        "vs_baseline": None,
        "dtype": args.dtype,
        "device": device,
        "peak_bf16_tflops": peak,
    })

    reps = 2
    # --- section: headline 64px DDIM sampling (per-batch emission: the
    # first completed batch point already puts a headline on stdout) -----
    sweep64, best64 = [], None
    for b in [int(v) for v in args.batches64.split(",")]:
        name = f"sample64_b{b}"
        if not em.section(name):
            continue
        try:
            r = bench_sample(CELEBA64_DPM, 512, 64, b, reps)
        except Exception as e:
            em.fail(name, e)
            continue
        sweep64.append(r)
        best64 = max(sweep64, key=lambda r: r["imgs_per_sec"])
        em.compact.update({
            "value": best64["imgs_per_sec"],
            "mfu_pct": best64["mfu_pct"],
            "batch": best64["batch"],
            "denoise_steps_per_sec_per_chip":
                best64["denoise_steps_per_sec"],
            # what the BATCHED programs traced under the auto gate (the b1
            # latency points in the same run trace unfused below batch 8
            # -- PERF.md "128px train breakdown")
            "fused_upsample": ops.use_fused_upsample(best64["batch"]),
        })
        em.detail["sweep_64px"] = [strip(r) for r in sweep64]
        em.detail["achieved_tflops"] = best64["achieved_tflops"]
        em.detail["eval_gflops"] = best64["eval_gflops"]
        em.finish(name)
    if best64 is None:
        em.emit(final=True)
        print("[bench] no 64px point completed", file=sys.stderr)
        return

    # --- section: reference-execution-model host loop (vs_baseline) -----
    if not args.skip_host_baseline and em.section("host_baseline"):
        try:
            host_imgs = bench_host_loop(best64, 64, best64["batch"])
            em.compact["vs_baseline"] = round(
                best64["imgs_per_sec"] / host_imgs, 3)
            em.detail["host_loop_imgs_per_sec"] = host_imgs
            em.finish("host_baseline")
        except Exception as e:
            em.fail("host_baseline", e)

    # --- section: 128px DDIM sampling --------------------------------
    best128 = None
    if not args.skip_128 and em.section("sample128"):
        try:
            sweep128 = [bench_sample(FFHQ128_DPM, 512, 128, b, reps)
                        for b in [int(v)
                                  for v in args.batches128.split(",")]]
            best128 = max(sweep128, key=lambda r: r["imgs_per_sec"])
            em.compact["s128_imgs_s"] = best128["imgs_per_sec"]
            em.compact["s128_mfu"] = best128["mfu_pct"]
            em.detail["ddim100_128px"] = strip(best128)
            em.detail["sweep_128px"] = [strip(r) for r in sweep128]
            # the reference's README-headline eval program (ddim1000
            # encode + ddim100 decode at ffhq128 geometry,
            # autoencoding_eval.py): imgs/s DERIVED from the measured
            # 128px DDIM **decode** evals/s over its 1100 chained evals.
            # Assumption: the encode scan runs at the same per-eval rate
            # as the decode scan -- they compile to slightly different
            # programs, so this figure can drift from the directly-timed
            # scripts/headline_eval.py record (PERF.md "Headline program
            # @128px") without any code regression.
            em.compact["headline128_derived"] = round(
                best128["denoise_steps_per_sec"] / 1100.0, 3)
            em.finish("sample128")
        except Exception as e:
            em.fail("sample128", e)

    # --- sections: train steps (K scanned steps, slope between two K
    # values -- the honest device-time method; dispatch idle and the
    # ~25ms tunnel round-trip cancel in the slope).  The legacy
    # dispatch-loop path remains behind --train_scan. ---------------------
    if not args.skip_train:
        from bench_train_step import measure_train_step
        peak_fl = peak * 1e12 if peak else None
        if em.section("train64"):
            try:
                sweep = [measure_train_step(64, b, peak_flops=peak_fl)
                         for b in [int(v)
                                   for v in args.train_batches64.split(",")]]
                best_t = max(sweep, key=lambda r: r["imgs_per_sec"])
                em.compact["train64_imgs_s"] = best_t["imgs_per_sec"]
                em.compact["train64_mfu"] = best_t.get("mfu_pct")
                train64 = dict(best_t)
                train64["sweep"] = sweep
                em.detail["train_64px"] = train64
                em.finish("train64")
            except Exception as e:
                em.fail("train64", e)
        if not args.skip_train_128 and em.section("train128"):
            try:
                remat128 = {"off": False, "full": True,
                            "skips": "skips"}[args.remat128]
                sweep128t = [
                    measure_train_step(128, b, remat=remat128,
                                       peak_flops=peak_fl)
                    for b in [int(v)
                              for v in args.train_batches128.split(",")]]
                best_t = max(sweep128t, key=lambda r: r["imgs_per_sec"])
                em.compact["train128_imgs_s"] = best_t["imgs_per_sec"]
                em.compact["train128_mfu"] = best_t.get("mfu_pct")
                train128 = dict(best_t)
                train128["sweep"] = sweep128t
                em.detail["train_128px"] = train128
                em.finish("train128")
            except Exception as e:
                em.fail("train128", e)
        if args.train_scan > 1 and em.section("train_dispatch_loop"):
            try:
                legacy = bench_train_dispatch_loop(
                    CELEBA64_DPM, 512, 64, args.train_batch, n_steps=12)
                em.detail["train_dispatch_loop"] = legacy
                em.finish("train_dispatch_loop")
            except Exception as e:
                em.fail("train_dispatch_loop", e)

    # --- section: stages 3-4 (latent-DPM MLPSkipNet + manipulation
    # Linear 512x40) train steps at the shipped config geometries -- the
    # remaining two of the four trainer stages (reference
    # train_latent_diffusion.py:72-93, train_manipulation.py:31-38);
    # slope-timed, seconds of chip time -----------------------------------
    if not args.skip_stage34 and em.section("stage34"):
        try:
            from bench_stage34 import (measure_latent_step,
                                       measure_manipulation_step)
            peak_fl = peak * 1e12 if peak else None
            tl = measure_latent_step(args.stage34_batch, peak_flops=peak_fl)
            tm = measure_manipulation_step(args.stage34_batch,
                                           peak_flops=peak_fl)
            em.compact["latent_steps_s"] = tl.get("steps_per_sec")
            em.compact["manip_steps_s"] = tm.get("steps_per_sec")
            em.detail["train_latent"] = tl
            em.detail["train_manipulation"] = tm
            em.finish("stage34")
        except Exception as e:
            em.fail("stage34", e)

    # --- section: batch-1 DDIM-100 serving latency (the chip is
    # underutilized at b1, so it must be measured, not divided down) ------
    if not args.skip_latency and em.section("latency_b1"):
        try:
            r1 = bench_sample(CELEBA64_DPM, 512, 64, 1, reps=4)
            em.compact["lat_b1_ms_ddim100"] = round(
                1000.0 / r1["imgs_per_sec"], 1)
            em.finish("latency_b1")
        except Exception as e:
            em.fail("latency_b1", e)

    # --- sections: DPM-Solver++(2M) fast decode at ~5x fewer NFE --------
    if args.dpm_steps:
        n = args.dpm_steps
        if em.section(f"dpm{n}_64"):
            try:
                r = bench_sample(CELEBA64_DPM, 512, 64, best64["batch"],
                                 reps, solver_steps=n)
                em.compact[f"dpm{n}_imgs_s"] = r["imgs_per_sec"]
                em.detail[f"dpm{n}_64px"] = strip(r)
                em.finish(f"dpm{n}_64")
            except Exception as e:
                em.fail(f"dpm{n}_64", e)
        if not args.skip_latency and em.section(f"dpm{n}_b1"):
            try:
                r1 = bench_sample(CELEBA64_DPM, 512, 64, 1, reps=4,
                                  solver_steps=n)
                em.compact[f"lat_b1_ms_dpm{n}"] = round(
                    1000.0 / r1["imgs_per_sec"], 1)
                em.finish(f"dpm{n}_b1")
            except Exception as e:
                em.fail(f"dpm{n}_b1", e)
        if best128 and em.section(f"dpm{n}_128"):
            try:
                r = bench_sample(FFHQ128_DPM, 512, 128, best128["batch"],
                                 reps, solver_steps=n)
                em.compact[f"dpm{n}_128_imgs_s"] = r["imgs_per_sec"]
                em.detail[f"dpm{n}_128px"] = strip(r)
                em.finish(f"dpm{n}_128")
            except Exception as e:
                em.fail(f"dpm{n}_128", e)

        # fast AUTOENCODE: dpm<N> encode (inversion on the reversed
        # lambda grid) + dpm<N> decode through the same ShiftUNet -- the
        # autoencoding_eval pattern (reference: ddim1000 encode + ddim100
        # decode = 1100 chained evals) at 2N evals.  The semantic-encoder
        # forward (~1 extra eval) is omitted, consistent with the decode
        # points above.
        if em.section("autoencode"):
            try:
                enc_tables = gd.solver_tables(f"dpm{n}",
                                              direction="encode")
                dec_tables = gd.solver_tables(f"dpm{n}")
                model, params, x, t, z = build(CELEBA64_DPM, 512, 64,
                                               best64["batch"])

                @jax.jit
                def ae_fused(p, x_0, zz):
                    dec = lambda xx, tt, zz_: model.apply({"params": p},
                                                          xx, tt, zz_)
                    x_T = dpm_lib.shift_dpm_solver_encode_loop(
                        enc_tables, dec, zz, x_0)
                    return dpm_lib.shift_dpm_solver_sample_loop(
                        dec_tables, dec, zz, x_T)

                key = jax.random.PRNGKey(0)
                x_0 = jnp.tanh(jax.random.normal(key, x.shape))
                zz = jax.random.normal(key, z.shape)
                jax.block_until_ready(ae_fused(params, x_0, zz))
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = ae_fused(params, x_0, zz)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps
                n_evals = (int(enc_tables.num_steps)
                           + int(dec_tables.num_steps))
                # the reference-pattern rate is DERIVED from the measured
                # DDIM decode evals/s (1100 chained evals), not
                # separately timed (same same-rate assumption as
                # headline128_derived above)
                ref_pattern = round(
                    best64["denoise_steps_per_sec"] / 1100.0, 3)
                ae_imgs = round(best64["batch"] / dt, 3)
                em.compact["ae_imgs_s"] = ae_imgs
                em.detail[f"autoencode_dpm{n}_64px"] = {
                    "batch": best64["batch"],
                    "imgs_per_sec": ae_imgs,
                    "evals": n_evals,
                    "ddim_pattern_imgs_per_sec_derived": ref_pattern,
                    "speedup_vs_ddim_pattern": round(
                        ae_imgs / ref_pattern, 1) if ref_pattern else None,
                }
                em.finish("autoencode")
            except Exception as e:
                em.fail("autoencode", e)

    # --- section: the REAL (end-to-end) stage-3 loop with device-resident
    # data -- drives the actual LatentDiffusionTrainer.train() (not
    # slope-timed): corpus in HBM, on-device index sampling, K=64 steps
    # per dispatch (PERF.md "Device-resident data"; reference counterpart:
    # one host DataLoader round-trip per step) -------------------------------
    if not args.skip_stage34 and em.section("latent_loop_resident"):
        try:
            import shutil as _sh
            import tempfile as _tf
            from bench_latent_loop import build_artifacts, latent_cfg
            from pdae_tpu.training import LatentDiffusionTrainer
            wk = _tf.mkdtemp(prefix="bench_resident_")
            try:
                build_artifacts(wk)
                # K=50 epoch sampling = the shipped celeba64_latent.yml
                # dispatch configuration (the host loader's exact index
                # stream, replayed from HBM)
                tr = LatentDiffusionTrainer(
                    config=latent_cfg(wk, 50, args.stage34_batch, u8=True,
                                      resident=True, corpus=2048),
                    run_path=os.path.join(wk, "run"))
                tr.train(max_steps=100, save_on_exit=False)   # compile+warm
                jax.block_until_ready(tr.state.params)
                s0 = int(tr.state.step)
                t0 = time.perf_counter()
                tr.train(max_steps=s0 + 200, save_on_exit=False)
                jax.block_until_ready(tr.state.params)
                dt = time.perf_counter() - t0
                n_act = int(tr.state.step) - s0
                em.compact["latent_loop_steps_s"] = round(n_act / dt, 1)
                em.detail["latent_loop_resident"] = {
                    "steps_per_sec": round(n_act / dt, 2),
                    "ms_per_step": round(1e3 * dt / n_act, 3),
                    "k": 50, "sampling": "epoch",
                    "batch": args.stage34_batch,
                    "device_resident": True, "transfer_uint8": True,
                    "timed_steps": n_act}
            finally:
                _sh.rmtree(wk, ignore_errors=True)
            em.finish("latent_loop_resident")
        except Exception as e:
            em.fail("latent_loop_resident", e)

    if args.trace:
        capture_trace(best64)

    em.emit(final=True)


if __name__ == "__main__":
    main()
