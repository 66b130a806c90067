#!/usr/bin/env python
"""Dump the compiled train-step HLO and name the hottest fusions.

The 128px profile (PERF.md "128px train breakdown") is flat per-op but
concentrated per-class; this tool maps the trace's anonymous
``fusion.N`` / ``convert_reduce_fusion.N`` instance names back to their
HLO definitions (root op, operand/result shapes) so the breakdown can
say WHICH tensors the time goes to.  It compiles the same K-scan
program ``bench_train_step.measure_train_step`` times (same build path
=> same instruction names, and the persistent cache makes the compile
a replay) and scans ``compiled.as_text()`` streaming.

    python scripts/dump_step_hlo.py --size 128 --batch 32 \
        --names fusion.8301,convert_reduce_fusion.412
    python scripts/dump_step_hlo.py --size 128 --batch 32 --classes
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_multi_compiled(size, batch, dtype_name="bfloat16", K=2,
                         xla_options=None):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM
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
    train_step = make_representation_train_step(gd, encoder, decoder, tx)

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

    x_0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    return multi.lower(state, frozen, x_0, jax.random.PRNGKey(0),
                       K=K).compile()


_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s+(\w+)\(")
def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=128, choices=[64, 128])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--names", default="",
                   help="comma list of instruction names to print "
                        "definitions for (with their fused computations)")
    p.add_argument("--classes", action="store_true",
                   help="aggregate instruction count by class + largest "
                        "result shapes")
    p.add_argument("--top_cycles", type=int, default=0, metavar="N",
                   help="rank instructions by the TPU cost model's "
                        "estimated_cycles (from backend_config) and print "
                        "the top N with their op_name metadata — "
                        "trace-name-free attribution of where compile-time "
                        "cost modelling expects the time to go")
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--xla_option", action="append", default=[],
                   metavar="K=V", help="XLA compiler option override, "
                   "repeatable (same syntax as bench_train_step.py)")
    p.add_argument("--save_text", default=None, metavar="FILE",
                   help="write the compiled HLO text to FILE (compile once, "
                        "analyze offline with --load_text)")
    p.add_argument("--load_text", default=None, metavar="FILE",
                   help="analyze a previously saved HLO text instead of "
                        "compiling")
    args = p.parse_args(argv)

    import jax
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.load_text:
        with open(args.load_text) as f:
            text = f.read()
    else:
        opts = (dict(kv.split("=", 1) for kv in args.xla_option)
                if args.xla_option else None)
        compiled = build_multi_compiled(args.size, args.batch, K=args.k,
                                        xla_options=opts)
        text = compiled.as_text()
    print(f"[HLO text: {len(text) / 1e6:.1f} MB]", file=sys.stderr)
    if args.save_text:
        with open(args.save_text, "w") as f:
            f.write(text)

    want = set(n.strip() for n in args.names.split(",") if n.strip())
    # fused computation bodies are named after their fusion instruction
    # (e.g. %fused_computation.123 for %fusion.123)
    want_comp = set()
    for n in want:
        m = re.match(r"(.*?)(\d+)$", n)
        if m:
            want_comp.add(f"fused_computation.{m.group(2)}")

    lines = text.splitlines()
    by_class = defaultdict(int)
    cycles = []   # (est_cycles, name, shape, op_name) when --top_cycles
    printing = 0
    _CYC_RE = re.compile(r'"estimated_cycles":"(\d+)"')
    _OPNAME_RE = re.compile(r'op_name="([^"]*)"')
    for i, ln in enumerate(lines):
        m = _DEF_RE.match(ln)
        if m and args.top_cycles:
            cm = _CYC_RE.search(ln)
            if cm:
                om = _OPNAME_RE.search(ln)
                cycles.append((int(cm.group(1)), m.group(1).lstrip("%"),
                               m.group(2).split("{")[0],
                               om.group(1) if om else ""))
        if m and args.classes:
            by_class[m.group(3)] += 1
        if want and m and m.group(1).lstrip("%") in want:
            print(f"--- {m.group(1)} ---")
            print(ln.strip()[:2000])
        if want_comp and ln.lstrip().startswith("%"):
            name = ln.lstrip()[1:].split(" ", 1)[0].split("(", 1)[0]
            if name in want_comp:
                printing = 60
                print(f"=== {name} ===")
        if printing:
            print(lines[i].rstrip()[:240])
            printing -= 1
            if ln.strip() == "}":
                printing = 0

    if args.classes:
        for cls, cnt in sorted(by_class.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{cls:30s} {cnt}")

    if args.top_cycles:
        total = sum(c for c, *_ in cycles)
        print(f"\n[cost-model total: {total / 1e6:.1f} Mcycles over "
              f"{len(cycles)} costed instructions]")
        for c, name, shape, op in sorted(cycles, reverse=True)[
                :args.top_cycles]:
            # keep the tail of the op_name path (the informative part)
            op_tail = "/".join(op.split("/")[-3:])
            print(f"{c / 1e3:10.1f} kcyc {100 * c / total:5.1f}%  "
                  f"{name:32s} {shape:28s} {op_tail}")


if __name__ == "__main__":
    main()
