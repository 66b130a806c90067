#!/usr/bin/env python
"""Stage-3 (latent DPM) and stage-4 (manipulation) train-step timing.

Same honest method as ``bench_train_step.py``: K serially-dependent
steps scanned into ONE program, per-step device time from the slope
between two K values (cancels the ~25 ms tunnel round-trip and the
1-core host's dispatch jitter).  Both steps are MLP-sized, so the slope
method matters even more here than for the UNet step -- a per-dispatch
loop would measure mostly the tunnel.

Geometries mirror the shipped configs exactly:
  * latent: ``configs/celeba64_latent.yml`` -- MLPSkipNet(512 -> 2048
    x10, time_emb 64) over the frozen 64px SemanticEncoder, batch 128,
    L1 loss on the const-beta latent schedule (reference
    trainer/train_latent_diffusion.py:72-93).
  * manipulation: ``configs/celebahq_manipulation.yml`` -- Linear(512,
    40) BCE over the frozen 128px SemanticEncoder, batch 128 (reference
    trainer/train_manipulation.py:31-38).

The steps come from the SAME builders the trainers run
(``training/steps.py::make_latent_train_step`` /
``make_manipulation_train_step``), so the benched program is
structurally identical to the trained one.

    python scripts/bench_stage34.py                  # both stages
    python scripts/bench_stage34.py --stage latent --batch 256
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197e12   # v5e; bench.py passes its own peak


def _slope_time(multi, state, extra, k_lo, k_hi, reps):
    """Per-step seconds from the K-scan slope (min over ``reps``)."""
    times = {}
    for k in (k_lo, k_hi):
        state, loss = multi(state, *extra, K=k)   # compile + warm donation
        float(loss)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            state, loss = multi(state, *extra, K=k)
            float(loss)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[k] = best
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo), state


def _step_flops(step_fn, *step_args):
    import jax
    try:
        cost = jax.jit(step_fn).lower(*step_args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def measure_latent_step(batch: int = 128, dtype_name: str = "bfloat16",
                        k_lo: int = 4, k_hi: int = 16, reps: int = 3,
                        peak_flops: float = PEAK_BF16_TFLOPS) -> dict:
    """celeba64_latent.yml geometry: steps/s, z/s, MFU for stage 3."""
    import jax
    import jax.numpy as jnp

    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import build_latent_denoise_fn, encoder_for_resolution
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_latent_train_step
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    model = build_latent_denoise_fn(
        {"model": "CELEBA64LatentDenoiseFn", "input_channel": 512,
         "model_channel": 2048, "num_layers": 10, "time_emb_channel": 64,
         "use_norm": True, "dropout": 0.0}, dtype=dtype)
    encoder = encoder_for_resolution(64, 512, dtype=dtype)

    x1 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    enc_params = jax.jit(encoder.init)(init_key(0), x1)["params"]
    z1 = jnp.zeros((1, 512))
    params = jax.jit(model.init)(init_key(2), z1,
                                 jnp.zeros((1,), jnp.int32))["params"]
    # AdamW per the config (optimizer_config: name AdamW, wd 0.01)
    tx = make_optimizer({"name": "AdamW", "lr": 1e-3, "weight_decay": 0.01})
    state = TrainState.create(params, tx)
    mean = jnp.zeros((512,), jnp.float32)
    std = jnp.ones((512,), jnp.float32)
    train_step = make_latent_train_step(gd, model, encoder, tx, mean, std)

    key = jax.random.PRNGKey(0)
    x_0 = jax.random.normal(key, (batch, 64, 64, 3), jnp.float32)
    flops = _step_flops(train_step, state, enc_params, x_0, key)

    # x_0 is loop-CARRIED and rolled each iteration: the frozen-encoder
    # forward must run every step as in real training (each step gets a
    # fresh batch).  With a fixed x_0 and frozen enc_p the encoder is
    # loop-invariant and XLA hoists it out of the scan -- the slope then
    # times only the MLP head while the FLOPs count includes the
    # encoder, overstating MFU (this overstated manipulation to >100%).
    @partial(jax.jit, static_argnames="K", donate_argnums=0)
    def multi(state, enc_p, x_0, rng, K):
        def body(carry, k):
            s, x, _ = carry
            x = jnp.roll(x, 1, axis=0)
            s, loss = train_step(s, enc_p, x, jax.random.fold_in(rng, k))
            return (s, x, loss), None
        (s, _, loss), _ = jax.lax.scan(body, (state, x_0, jnp.float32(0)),
                                       jnp.arange(K))
        return s, loss

    step_s, _ = _slope_time(multi, state, (enc_params, x_0, key),
                            k_lo, k_hi, reps)
    out = {
        "stage": "latent_dpm", "batch": batch,
        "ms_per_step": round(step_s * 1e3, 3),
        "steps_per_sec": round(1.0 / step_s, 2),
        "z_per_sec": round(batch / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 2) if flops else None,
    }
    if flops and peak_flops and dtype_name == "bfloat16":
        out["achieved_tflops"] = round(flops / step_s / 1e12, 2)
        out["mfu_pct"] = round(100 * flops / step_s / peak_flops, 1)
    return out


def measure_manipulation_step(batch: int = 128,
                              dtype_name: str = "bfloat16",
                              k_lo: int = 4, k_hi: int = 16, reps: int = 3,
                              peak_flops: float = PEAK_BF16_TFLOPS) -> dict:
    """celebahq_manipulation.yml geometry: steps/s, imgs/s, MFU, stage 4."""
    import jax
    import jax.numpy as jnp

    from pdae_tpu.diffusion import GaussianDiffusion
    from pdae_tpu.models import build_classifier, encoder_for_resolution
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_manipulation_train_step
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    model = build_classifier(40)
    encoder = encoder_for_resolution(128, 512, dtype=dtype)

    x1 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    enc_params = jax.jit(encoder.init)(init_key(0), x1)["params"]
    params = jax.jit(model.init)(init_key(3),
                                 jnp.zeros((1, 512)))["params"]
    tx = make_optimizer({"lr": 1e-4})
    state = TrainState.create(params, tx)
    mean = jnp.zeros((512,), jnp.float32)
    std = jnp.ones((512,), jnp.float32)
    train_step = make_manipulation_train_step(gd, model, encoder, tx,
                                              mean, std)

    key = jax.random.PRNGKey(0)
    x_0 = jax.random.normal(key, (batch, 128, 128, 3), jnp.float32)
    label = (jax.random.uniform(key, (batch, 40)) > 0.5).astype(jnp.int32)
    flops = _step_flops(train_step, state, enc_params, x_0, label)

    # x_0 loop-carried + rolled per step for the same reason as in
    # measure_latent_step: the frozen 128px encoder forward must not be
    # hoisted out of the scan as loop-invariant (it is ~all the FLOPs).
    @partial(jax.jit, static_argnames="K", donate_argnums=0)
    def multi(state, enc_p, x_0, label, K):
        def body(carry, _):
            s, x, _l = carry
            x = jnp.roll(x, 1, axis=0)
            s, loss = train_step(s, enc_p, x, label)
            return (s, x, loss), None
        (s, _, loss), _ = jax.lax.scan(body, (state, x_0, jnp.float32(0)),
                                       jnp.arange(K))
        return s, loss

    step_s, _ = _slope_time(multi, state, (enc_params, x_0, label),
                            k_lo, k_hi, reps)
    out = {
        "stage": "manipulation", "batch": batch,
        "ms_per_step": round(step_s * 1e3, 3),
        "steps_per_sec": round(1.0 / step_s, 2),
        "imgs_per_sec": round(batch / step_s, 1),
        "gflops_per_step": round(flops / 1e9, 2) if flops else None,
    }
    if flops and peak_flops and dtype_name == "bfloat16":
        out["achieved_tflops"] = round(flops / step_s / 1e12, 2)
        out["mfu_pct"] = round(100 * flops / step_s / peak_flops, 1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="both",
                   choices=["latent", "manipulation", "both"])
    p.add_argument("--batch", type=int, default=128,
                   help="per-chip batch (configs ship 128 for both stages)")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--k_lo", type=int, default=4)
    p.add_argument("--k_hi", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.platform == "cpu":
        from pdae_tpu.utils.cache import cpu_cache_dir
        cache = cpu_cache_dir(root)
    else:
        cache = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    out = {}
    if args.stage in ("latent", "both"):
        out["latent"] = measure_latent_step(
            args.batch, args.dtype, args.k_lo, args.k_hi, args.reps)
    if args.stage in ("manipulation", "both"):
        out["manipulation"] = measure_manipulation_step(
            args.batch, args.dtype, args.k_lo, args.k_hi, args.reps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
