#!/usr/bin/env python
"""Micro-benchmark: training fwd+bwd of the GroupNorm+AdaGN+SiLU chain.

Compares, at the flagship ResBlock shapes (PERF.md op-class table: the
26% GN-stat line item), the generic-autodiff inline composition against
the closed-form stat-caching custom VJP (``ops/groupnorm_train.py``) and,
when present, Pallas variants.  Run on the chip:

    python scripts/bench_gn_train.py            # bf16, train shapes
    python scripts/bench_gn_train.py --b 32
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=64)
    p.add_argument("--platform", default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    import jax.numpy as jnp

    from pdae_tpu.ops.groupnorm_train import (gn_adagn_silu_inline,
                                              gn_adagn_silu_train,
                                              gn_adagn_silu_train_pallas)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B = args.b
    # decoder ResBlock geometries of the celeba64 flagship (base 128,
    # mult 1,2,2,4) and the 128px ffhq trunk's biggest maps
    shapes = [(B, 64, 64, 128), (B, 32, 32, 256), (B, 16, 16, 256),
              (B, 8, 8, 512)]

    import numpy as np

    def bench(fn, x, vecs, cot, reps):
        gn_s, gn_b, sc, sh, zs, zt = vecs

        # Honest device time: K serially-dependent fwd+bwd iterations
        # inside ONE lax.scan program, completion forced by fetching a
        # scalar, timed at two K values -- the slope removes the ~25 ms
        # fixed tunnel round-trip that distorts per-dispatch timing
        # (CLAUDE.md: scan timings are stable, dispatch loops are not).
        # The carry threads dx back into x (no hoisting/DCE); out and
        # every grad are folded in live.
        from functools import partial

        @partial(jax.jit, static_argnames="K")
        def loop(x, gn_s, gn_b, sc, sh, zs, zt, cot, K):
            def body(carry, _):
                xx = carry
                out, vjp = jax.vjp(lambda *a: fn(*a, 32),
                                   xx, gn_s, gn_b, sc, sh, zs, zt)
                gx, *gsmall = vjp(cot)
                small = sum(jnp.sum(g) for g in gsmall)
                nxt = (xx + 0.001 * gx
                       + (0.001 * out + small.astype(out.dtype) * 1e-12))
                return nxt.astype(xx.dtype), None
            y, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.mean(y.astype(jnp.float32))

        k_lo, k_hi = max(4, reps // 5), reps
        ts = {}
        for k in (k_lo, k_hi):
            m = loop(x, gn_s, gn_b, sc, sh, zs, zt, cot, K=k)
            np.asarray(m)   # warm compile + page in
            t0 = time.perf_counter()
            m = loop(x, gn_s, gn_b, sc, sh, zs, zt, cot, K=k)
            np.asarray(m)
            ts[k] = time.perf_counter() - t0
        return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo) * 1e6  # us/iter

    key = jax.random.PRNGKey(0)
    total = {}
    for shape in shapes:
        b, h, w, c = shape
        ks = jax.random.split(key, 7)
        x = jax.random.normal(ks[0], shape, dtype)
        vecs = (jax.random.normal(ks[1], (c,), jnp.float32) * 0.1 + 1.0,
                jax.random.normal(ks[2], (c,), jnp.float32) * 0.1,
                jax.random.normal(ks[3], (b, c), dtype) * 0.1,
                jax.random.normal(ks[4], (b, c), dtype) * 0.1,
                jax.random.normal(ks[5], (b, c), dtype) * 0.1,
                jax.random.normal(ks[6], (b, c), dtype) * 0.1)
        cot = jax.random.normal(ks[0], shape, dtype)

        # correctness gate: pallas backward == closed-form backward
        def grads(fn):
            def loss(*a):
                return jnp.sum(fn(*a, 32).astype(jnp.float32)
                               * cot.astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=tuple(range(7))))(
                x, *vecs)
        import numpy as _np
        for a, bb in zip(grads(gn_adagn_silu_train_pallas),
                         grads(gn_adagn_silu_train)):
            sc = max(float(jnp.max(jnp.abs(bb)).astype(jnp.float32)), 1.0)
            _np.testing.assert_allclose(
                _np.asarray(a, _np.float32), _np.asarray(bb, _np.float32),
                atol=3e-2 * sc)

        row = {}
        for name, fn in [("inline", gn_adagn_silu_inline),
                         ("closed", gn_adagn_silu_train),
                         ("pallas", gn_adagn_silu_train_pallas)]:
            us = bench(fn, x, vecs, cot, args.reps)
            row[name] = us
            total[name] = total.get(name, 0.0) + us
        # ideal HBM time: fwd r+w, bwd 2r+1w = 5 passes of B*H*W*C elems
        bytes_total = 5 * b * h * w * c * x.dtype.itemsize
        row["roofline_us"] = bytes_total / 819e9 * 1e6  # v5e ~819 GB/s
        print(f"{shape}: " + "  ".join(
            f"{k}={v:9.1f}us" for k, v in row.items()), flush=True)
    print("TOTALS: " + "  ".join(f"{k}={v:9.1f}us"
                                 for k, v in total.items()))


if __name__ == "__main__":
    main()
