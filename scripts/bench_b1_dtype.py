"""Batch-1 decode latency: fp32-stored vs bf16-stored params.

PERF.md's dead-end table ruled out bf16 param storage at b16 THROUGHPUT
(+1.4%: weight streaming hides behind compute).  At batch 1 the
arithmetic intensity is 16x lower, so the ~250 MB fp32 weight read per
UNet eval is a visible fraction of the step -- this measures whether
halving it moves the serving-latency headline, and what it does to the
decode output (max |drift| on the final image).

Usage: python scripts/bench_b1_dtype.py [--steps 100] [--dpm 20]
"""
import argparse, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--dpm", type=int, default=20)
    p.add_argument("--platform", default=None)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    from pdae_tpu.utils.cache import cpu_cache_dir
    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = (os.path.join(_root, ".jax_cache")
             if args.platform != "cpu" else cpu_cache_dir(_root))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from __graft_entry__ import CELEBA64_DPM
    from pdae_tpu.diffusion import (GaussianDiffusion, ddim as ddim_lib,
                                    dpm_solver as dpm_lib)
    from pdae_tpu.models import ShiftUNet
    from pdae_tpu.utils import init_key

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    model = ShiftUNet(latent_dim=512, dtype=jnp.bfloat16, **CELEBA64_DPM)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z0 = jnp.zeros((1, 512), jnp.float32)
    params = jax.jit(model.init)(init_key(0), x, t, z0)["params"]
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    kx, kz = jax.random.split(jax.random.PRNGKey(0))
    x_T = jax.random.normal(kx, x.shape)
    z = jax.random.normal(kz, z0.shape)

    def timed(fused, p):
        out = jax.block_until_ready(fused(p, x_T, z))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fused(p, x_T, z)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps * 1000.0, out

    results = {}
    for name, nsteps, make in (
            ("ddim%d" % args.steps, args.steps, "ddim"),
            ("dpm%d" % args.dpm, args.dpm, "dpm")):
        if make == "ddim":
            dds = gd.ddim_schedule("ddim%d" % nsteps)

            @jax.jit
            def fused(p, xT, zz):
                dec = lambda xx, tt, zz_: model.apply({"params": p},
                                                      xx, tt, zz_)
                return ddim_lib.shift_ddim_sample_loop(dds, dec, zz, xT)
        else:
            tables = gd.solver_tables("dpm%d" % nsteps)

            @jax.jit
            def fused(p, xT, zz):
                dec = lambda xx, tt, zz_: model.apply({"params": p},
                                                      xx, tt, zz_)
                return dpm_lib.shift_dpm_solver_sample_loop(
                    tables, dec, zz, xT)
        ms32, out32 = timed(fused, params)
        ms16, out16 = timed(fused, params_bf16)
        drift = float(jnp.max(jnp.abs(out32.astype(jnp.float32)
                                      - out16.astype(jnp.float32))))
        results[name] = {"fp32_params_ms": round(ms32, 1),
                         "bf16_params_ms": round(ms16, 1),
                         "speedup": round(ms32 / ms16, 3),
                         "max_abs_drift": round(drift, 5)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
