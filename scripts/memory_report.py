#!/usr/bin/env python
"""Per-program HBM memory report from XLA's own accounting.

Compiles the real bench/train programs and prints each one's
``Compiled.memory_analysis()``: temp (activation/workspace) bytes,
argument bytes, and output bytes -- the numbers behind PERF.md's
"HBM footprint" table.  Measured v5e outcome (recorded there): the
remat modes do NOT change XLA's assigned temp memory on these programs
(within 1.5% at 128px b32 and b64, with or without the GN custom-vjp),
so ``remat: off`` is both the fastest AND the memory profile; the
stat-caching GN vjp itself SAVES ~15% temp on top of its speed win.

Programs (comma list via --programs, default all):
  sample64        DDIM-100 eval scan, celeba64 geometry, b16
  dpm20_64        DPM-Solver++(2M) 20-NFE decode, b16
  train64:off     representation train step, 64px b32, no remat
  train128:off    ffhq geometry, 128px b32, no remat (shipped default)
  train128:full   same, full decoder remat
  train128:skips  same, skip-activation checkpoint policy

Output: ONE JSON line {program: {temp_mb, argument_mb, output_mb}}.
Run on the TPU chip for real numbers (compiles are cached across runs);
``--platform cpu`` works for smoke testing with --programs train64:off.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--programs",
                   default="sample64,dpm20_64,train64:off,train128:off,"
                           "train128:full,train128:skips")
    p.add_argument("--platform", default=None)
    p.add_argument("--batch64", type=int, default=32)
    p.add_argument("--batch128", type=int, default=32)
    p.add_argument("--tiny", action="store_true",
                   help="tiny geometry for CI (16px, base 32)")
    p.add_argument("--no_gn_vjp", action="store_true",
                   help="disable the stat-caching GroupNorm custom-vjp "
                        "(its residuals are exempt from jax.checkpoint, "
                        "so this isolates remat's effect on temp memory)")
    args = p.parse_args(argv)
    if args.no_gn_vjp:
        from pdae_tpu.ops import set_gn_train_vjp
        set_gn_train_vjp(False)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    from pdae_tpu.utils.cache import cpu_cache_dir
    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = (os.path.join(_root, ".jax_cache")
                 if args.platform != "cpu" else cpu_cache_dir(_root))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM, TINY_DPM
    from pdae_tpu.diffusion import GaussianDiffusion, ddim as ddim_lib
    from pdae_tpu.diffusion import dpm_solver as dpm_lib
    from pdae_tpu.models import ShiftUNet, SemanticEncoder
    from pdae_tpu.models import encoder_for_resolution
    from pdae_tpu.training.partition import split_shift_unet
    from pdae_tpu.training.state import TrainState, make_optimizer
    from pdae_tpu.training.steps import make_representation_train_step
    from pdae_tpu.utils import init_key

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dtype = jnp.bfloat16

    def geometry(px):
        if args.tiny:
            return TINY_DPM, 16, 16, 4
        if px == 64:
            return CELEBA64_DPM, 64, 512, args.batch64
        return FFHQ128_DPM, 128, 512, args.batch128

    def build_sample(px, solver_steps=None):
        geo, size, latent, _ = geometry(px)
        batch = 16 if not args.tiny else 4
        model = ShiftUNet(latent_dim=latent, **{**geo, "dropout": 0.0},
                          dtype=dtype)
        # fp32 loop carry over a bf16-compute model, as bench.py measures
        x = jnp.zeros((batch, size, size, 3))
        params = jax.jit(model.init)(
            init_key(0), x, jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch, latent)))["params"]
        dec = lambda p: (lambda xx, tt, zz: model.apply({"params": p},
                                                        xx, tt, zz))
        if solver_steps:
            tables = gd.solver_tables(f"dpm{solver_steps}")
            fn = lambda p, xT, z: dpm_lib.shift_dpm_solver_sample_loop(
                tables, dec(p), z, xT)
        else:
            dds = gd.ddim_schedule("ddim100" if not args.tiny else "ddim5")
            fn = lambda p, xT, z: ddim_lib.shift_ddim_sample_loop(
                dds, dec(p), z, xT)
        lowered = jax.jit(fn).lower(params, x,
                                    jnp.zeros((batch, latent)))
        return lowered.compile()

    def build_train(px, remat):
        geo, size, latent, batch = geometry(px)
        decoder = ShiftUNet(latent_dim=latent, **geo, dtype=dtype)
        if args.tiny:
            encoder = SemanticEncoder(latent, channels=(8, 16),
                                      attn_after_stage=2, dtype=dtype)
        else:
            encoder = encoder_for_resolution(size, latent, dtype=dtype)
        x = jnp.zeros((1, size, size, 3))
        enc_params = jax.jit(encoder.init)(init_key(0), x)["params"]
        dec_params = jax.jit(decoder.init)(
            init_key(1), x, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, latent)))["params"]
        shift, frozen = split_shift_unet(dec_params)
        tx = make_optimizer({"lr": 1e-4})
        state = TrainState.create({"encoder": enc_params, "shift": shift},
                                  tx)
        step = make_representation_train_step(gd, encoder, decoder, tx,
                                              remat=remat)
        batch_x = jnp.zeros((batch, size, size, 3))
        lowered = jax.jit(step, donate_argnums=0).lower(
            state, frozen, batch_x, jax.random.PRNGKey(0))
        return lowered.compile()

    def analyze(compiled):
        m = compiled.memory_analysis()
        mb = lambda b: round(float(b) / 2**20, 1)
        return {"temp_mb": mb(m.temp_size_in_bytes),
                "argument_mb": mb(m.argument_size_in_bytes),
                "output_mb": mb(m.output_size_in_bytes)}

    remats = {"off": False, "full": True, "skips": "skips"}

    def parse_remat(prog):
        parts = prog.split(":")
        if len(parts) != 2 or parts[1] not in remats:
            raise SystemExit(
                f"bad program {prog!r}: train programs are "
                f"train64:<mode>/train128:<mode> with mode in "
                f"{sorted(remats)}")
        return remats[parts[1]]

    out = {"device": str(jax.devices()[0]), "tiny": bool(args.tiny)}
    for prog in args.programs.split(","):
        prog = prog.strip()
        if prog == "sample64":
            c = build_sample(64)
        elif prog == "dpm20_64":
            c = build_sample(64, solver_steps=20 if not args.tiny else 5)
        elif prog.startswith("train64"):
            c = build_train(64, parse_remat(prog))
        elif prog.startswith("train128"):
            c = build_train(128, parse_remat(prog))
        else:
            raise SystemExit(f"unknown program {prog!r}")
        out[prog] = analyze(c)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
