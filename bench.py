#!/usr/bin/env python
"""Benchmark: PDAE denoising throughput on one TPU chip.

Primary metric (BASELINE.json): DDIM-100 image sampling throughput through
the flagship ShiftUNet decoder at 64px, plus denoise steps/sec/chip.

``vs_baseline`` compares the TPU-native execution model (whole DDIM loop
fused into one XLA program via lax.scan) against the reference's execution
model (one host-driven model dispatch per timestep with a host sync each
step, as in /root/reference/diffusion/ddim.py:57-63) running the SAME
jitted model on the SAME chip.  That isolates the framework-design win from
the hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny model + few steps (CI smoke)")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--platform", default=None)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--train", action="store_true",
                   help="benchmark the PDAE training step instead of "
                        "DDIM sampling")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    # persistent compile cache: repeat bench runs skip the 30-60s compiles
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import CELEBA64_DPM, TINY_DPM
    from pdae_tpu.diffusion import GaussianDiffusion, ddim as ddim_lib
    from pdae_tpu.models import ShiftUNet
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.quick:
        geometry, latent_dim, size, batch, steps = (
            TINY_DPM, 16, 16, 8, 10)
    else:
        geometry, latent_dim, size, batch, steps = (
            CELEBA64_DPM, 512, args.image_size, args.batch, args.ddim_steps)

    model = ShiftUNet(latent_dim=latent_dim, dtype=dtype, **geometry)
    x = jnp.zeros((batch, size, size, geometry["input_channel"]), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    z = jnp.zeros((batch, latent_dim), jnp.float32)
    params = jax.jit(model.init)(init_key(0), x, t, z)["params"]

    gd = GaussianDiffusion({"timesteps": 1000, "betas_type": "linear"})
    dds = gd.ddim_schedule(f"ddim{steps}")

    if args.train:
        _bench_train(jax, jnp, np, model, params, gd, batch, size,
                     geometry, latent_dim, reps=1 if args.quick else 5,
                     dtype_name=args.dtype)
        return

    def decoder_with(p):
        return lambda xx, tt, zz: model.apply({"params": p}, xx, tt, zz)

    # ---- TPU-native path: whole loop = one XLA program ----------------- #
    # params are explicit jit args (closed-over arrays would be baked into
    # the HLO as constants -- huge programs, and the axon remote-compile
    # endpoint rejects them)
    @jax.jit
    def fused_sample(p, x_T, zz):
        return ddim_lib.shift_ddim_sample_loop(dds, decoder_with(p), zz, x_T)

    key = jax.random.PRNGKey(0)
    x_T = jax.random.normal(key, x.shape)
    zz = jax.random.normal(key, z.shape)

    jax.block_until_ready(fused_sample(params, x_T, zz))   # compile + warm
    reps = 1 if args.quick else 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fused_sample(params, x_T, zz)
    jax.block_until_ready(out)
    fused_dt = (time.perf_counter() - t0) / reps
    fused_imgs_per_sec = batch / fused_dt

    # ---- reference execution model: host-driven per-step dispatch ----- #
    @jax.jit
    def one_step(p, xx, i, zz):
        tt = jnp.full((batch,), 0, jnp.int32) + dds.timestep_map[i]
        eps, g = decoder_with(p)(xx, tt, zz)
        coef = dds.sqrt_one_minus_alphas_cumprod[i]
        eps = eps - coef * g
        sr = dds.sqrt_recip_alphas_cumprod[i]
        srm1 = dds.sqrt_recip_alphas_cumprod_m1[i]
        x0 = jnp.clip(sr * xx - srm1 * eps, -1, 1)
        new_eps = (sr * xx - x0) / srm1
        ap = dds.alphas_cumprod_prev[i]
        return x0 * jnp.sqrt(ap) + jnp.sqrt(1 - ap) * new_eps

    # measure a subset of host-driven steps and scale (per-step cost is
    # constant; avoids paying 100 tunnel round-trips in CI)
    host_steps = steps if args.quick else min(steps, 20)

    def host_loop(x_T, zz):
        xx = x_T
        for i in range(steps, steps - host_steps, -1):
            xx = one_step(params, xx, jnp.int32(i), zz)
            np.asarray(xx[0, 0, 0, 0])   # host sync per step, like .item()
        return xx

    jax.block_until_ready(one_step(params, x_T, jnp.int32(steps), zz))
    t0 = time.perf_counter()
    ref = host_loop(x_T, zz)
    jax.block_until_ready(ref)
    host_dt = (time.perf_counter() - t0) * (steps / host_steps)
    host_imgs_per_sec = batch / host_dt

    result = {
        "metric": f"ddim{steps}_imgs_per_sec_{size}px_shiftunet",
        "value": round(fused_imgs_per_sec, 3),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(fused_imgs_per_sec / host_imgs_per_sec, 3),
        "denoise_steps_per_sec_per_chip": round(batch * steps / fused_dt, 1),
        "batch": batch,
        "image_size": size,
        "dtype": args.dtype,
        "host_loop_imgs_per_sec": round(host_imgs_per_sec, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def _bench_train(jax, jnp, np, model, params, gd, batch, size, geometry,
                 latent_dim, reps, dtype_name):
    """PDAE representation-learning train step throughput (fwd+bwd+adam+EMA
    over the trainable {encoder, shift} subtree)."""
    import optax
    from pdae_tpu.models import encoder_for_resolution
    from pdae_tpu.training.partition import merge_params, split_shift_unet
    from pdae_tpu.training.state import TrainState, ema_update, make_optimizer
    from pdae_tpu.utils import init_key

    encoder = encoder_for_resolution(size, latent_dim) if size in (64, 128) \
        else None
    if encoder is None:
        from pdae_tpu.models.encoder import SemanticEncoder
        encoder = SemanticEncoder(latent_dim, channels=(8, 16),
                                  attn_after_stage=2)
    x = jnp.zeros((batch, size, size, geometry["input_channel"]))
    enc_params = jax.jit(encoder.init)(init_key(2), x)["params"]
    shift_params, frozen = split_shift_unet(params)
    tx = make_optimizer({"lr": 1e-4})
    state = TrainState.create({"encoder": enc_params, "shift": shift_params},
                              tx)

    def train_step(state, frozen, x_0, rng):
        def loss_fn(p):
            out = gd.representation_learning_train_one_batch(
                rng,
                lambda xx: encoder.apply({"params": p["encoder"]}, xx),
                lambda xx, tt, zz: model.apply(
                    {"params": merge_params(frozen, p["shift"])}, xx, tt, zz),
                x_0)
            return out["prediction_loss"]

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(jnp.add, state.params, updates)
        ema = ema_update(state.ema_params, new_params, 0.9999)
        return state.replace(step=state.step + 1, params=new_params,
                             ema_params=ema, opt_state=opt_state), loss

    step = jax.jit(train_step, donate_argnums=0)
    key = jax.random.PRNGKey(0)
    x_0 = jax.random.normal(key, x.shape)
    state, loss = step(state, frozen, x_0, key)
    jax.block_until_ready(loss)
    n = 10 * reps
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, frozen, x_0,
                           jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    result = {
        "metric": f"pdae_train_steps_per_sec_{size}px_b{batch}",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": 1.0,
        "imgs_per_sec": round(batch / dt, 1),
        "batch": batch,
        "image_size": size,
        "dtype": dtype_name,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
