#!/usr/bin/env python
"""128px roofline closure: is the measured time ~= the HBM bound?

VERDICT r4 #6: the 128px MFU gap (75.4% sampling / 64% train vs 81%/70%
@64px) was ATTRIBUTED to GroupNorm-stat traffic over bigger planes (28%
of device time) + skip adds (9%), but "structural" was asserted, not
derived.  This script derives it: for the compiled program it computes

  * t_mxu  = XLA-counted flops / chip bf16 peak        (compute bound)
  * t_hbm  = estimated HBM bytes moved / HBM bandwidth (memory bound)
  * roofline = max(t_mxu, t_hbm)  vs the measured wall per step/eval

and a per-fusion-class byte table (writes + operand reads from the
post-optimization HLO), so each trace class's measured ms can be
compared against its own bandwidth lower bound bytes/BW.

Byte model: every non-aliasing instruction writes its result and reads
each operand once (parameter / constant / get-tuple-element / tuple /
bitcast are aliases = zero traffic).  This is the standard post-fusion
HBM-traffic estimate: intermediates inside a fusion never materialize;
a tensor consumed by N instructions is read N times.  VMEM residency
can only LOWER real traffic, so bytes/BW is a (slightly optimistic)
lower bound on memory-bound time.

    python scripts/roofline.py --what sample --size 128 --batch 8 \
        --measured_ms 11.86
    python scripts/roofline.py --what train --size 128 --batch 32 \
        --measured_ms 104.9
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# v5e: 197 TFLOP/s bf16, 819 GB/s HBM (publicly documented figures)
PEAK_FLOPS = 197e12
HBM_BW = 819e9

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2,
                "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8,
                "u64": 8, "f64": 8, "c64": 8, "c128": 16}

_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w\-]+)\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([\d,]*)\]")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")

# result aliases its operand(s): no HBM traffic of its own
_FREE_OPS = {"parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "after-all", "partition-id", "replica-id"}


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue  # token/opaque
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def classify(name: str) -> str:
    """Instruction name -> trace class (strip the .N instance suffix)."""
    return re.sub(r"[.\d]+$", "", name) or name


_CALLED_RE = re.compile(r"(?:calls|to_apply)=%([\w.\-]+)")
# a computation header ends with "{" and is not an instruction ("=");
# parameter lists nest parens (tuple types), so don't try to span them
_COMP_NAME_RE = re.compile(r"^\s*(?:ENTRY\s+)?%?([\w.\-]+)")


def analyze_text(text: str):
    """Per-class {count, write_bytes, read_bytes} + totals.

    Only TOP-LEVEL instructions count: computations referenced via
    ``calls=`` (fusion bodies) or ``to_apply=`` (reduce combiners) are
    the INSIDE of a fusion -- their intermediates never reach HBM; the
    outer fusion instruction already carries the materialized result +
    operand shapes.  While/conditional bodies (referenced via body= /
    condition= / branch_computations=) DO count: they run per iteration
    and their instructions materialize.  Loop bodies appear ONCE in the
    text, so sums are per-iteration -- matching XLA cost_analysis, which
    also counts scan bodies once."""
    lines = text.splitlines()

    # pass 1: computations that are fusion/reduce bodies are excluded
    fused_comps = set()
    for ln in lines:
        for name in _CALLED_RE.findall(ln):
            fused_comps.add(name)

    result_bytes = {}
    defs = []
    current_comp = None
    for ln in lines:
        if ln.rstrip().endswith("{") and " = " not in ln:
            cm = _COMP_NAME_RE.match(ln)
            if cm:
                current_comp = cm.group(1)
            continue
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name, shape_str, opcode = m.groups()
        b = shape_bytes(shape_str)
        result_bytes[name] = b
        if current_comp in fused_comps:
            continue
        defs.append((name, opcode, b, ln))

    per_class = defaultdict(lambda: {"count": 0, "write_b": 0, "read_b": 0})
    for name, opcode, wbytes, ln in defs:
        if opcode in _FREE_OPS:
            continue
        cls = per_class[classify(name)]
        cls["count"] += 1
        cls["write_b"] += wbytes
        # operands: %names after the opcode's open paren, before attrs;
        # names not in the map (computations, regions) contribute 0
        call = ln.split(f" {opcode}(", 1)
        if len(call) == 2:
            ops_str = call[1].split("),", 1)[0]
            for op in _OPERAND_RE.findall(ops_str):
                cls["read_b"] += result_bytes.get(op, 0)
    return per_class


def report(per_class, flops, measured_ms, top=12):
    total_b = sum(c["write_b"] + c["read_b"] for c in per_class.values())
    t_mxu_ms = flops / PEAK_FLOPS * 1e3 if flops else None
    t_hbm_ms = total_b / HBM_BW * 1e3
    rows = sorted(per_class.items(),
                  key=lambda kv: -(kv[1]["write_b"] + kv[1]["read_b"]))[:top]
    out = {
        "flops": flops,
        "t_mxu_ms": round(t_mxu_ms, 3) if t_mxu_ms else None,
        "est_hbm_gb": round(total_b / 1e9, 3),
        "t_hbm_ms": round(t_hbm_ms, 3),
        "roofline_ms": round(max(t_mxu_ms or 0, t_hbm_ms), 3),
        "measured_ms": measured_ms,
        "pct_of_roofline": (round(100 * max(t_mxu_ms or 0, t_hbm_ms)
                                  / measured_ms, 1)
                            if measured_ms else None),
        "classes": [
            {"class": name,
             "count": c["count"],
             "gb": round((c["write_b"] + c["read_b"]) / 1e9, 3),
             "t_hbm_ms": round((c["write_b"] + c["read_b"]) / HBM_BW * 1e3,
                               3)}
            for name, c in rows],
    }
    return out


def build_sample(size: int, batch: int, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import CELEBA64_DPM, FFHQ128_DPM
    from pdae_tpu.models import ShiftUNet
    from pdae_tpu.utils import init_key

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    geometry = CELEBA64_DPM if size == 64 else FFHQ128_DPM
    model = ShiftUNet(latent_dim=512, dtype=dtype, **geometry)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    z = jnp.zeros((batch, 512), jnp.float32)
    params = jax.jit(model.init)(init_key(0), x, t, z)["params"]
    f = jax.jit(lambda p, xx, tt, zz: model.apply({"params": p},
                                                  xx, tt, zz))
    return f.lower(params, x, t, z).compile()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--what", choices=["sample", "train"], default="sample")
    p.add_argument("--size", type=int, default=128, choices=[64, 128])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--measured_ms", type=float, default=None,
                   help="measured wall per eval (sample) / per step "
                        "(train) to compare against the bound")
    p.add_argument("--platform", default=None)
    p.add_argument("--top", type=int, default=12)
    p.add_argument("--load_text", default=None, metavar="FILE",
                   help="analyze a saved HLO text (dump_step_hlo.py "
                        "--save_text) instead of compiling")
    p.add_argument("--flops_gf", type=float, default=None,
                   help="program GFLOPs (required with --load_text; "
                        "taken from cost_analysis otherwise)")
    args = p.parse_args(argv)
    if args.batch is None:
        args.batch = 8 if args.what == "sample" else 32

    if args.load_text:
        with open(args.load_text) as f:
            text = f.read()
        flops = (args.flops_gf or 0.0) * 1e9
        xla_bytes = 0.0
    else:
        import jax
        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        if args.what == "sample":
            compiled = build_sample(args.size, args.batch)
        else:
            from dump_step_hlo import build_multi_compiled
            compiled = build_multi_compiled(args.size, args.batch, K=2)

        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        if args.flops_gf:
            flops = args.flops_gf * 1e9
        xla_bytes = float(ca.get("bytes accessed", 0.0)) if ca else 0.0
        text = compiled.as_text()

    per_class = analyze_text(text)
    out = report(per_class, flops, args.measured_ms, top=args.top)
    out["what"] = f"{args.what}{args.size}_b{args.batch}"
    out["xla_bytes_accessed_gb"] = round(xla_bytes / 1e9, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
