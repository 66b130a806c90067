#!/usr/bin/env python
"""Summarize a ``jax.profiler`` trace: top ops per lane, device/host split.

The reference's only intra-step observability is wall-clock phase meters
printed from python (/root/reference/trainer/train_regular_diffusion.py:62-123,
whose own comment admits CUDA async skews the attribution).  Here the
profiler is the source of truth: any trainer takes
``runner_config.profile_dir`` and ``bench.py --trace DIR`` captures the
headline sampling program; this tool turns the resulting trace into the
top-K table that PERF.md's roofline analysis is based on, with no
dependencies beyond the stdlib (the tensorboard profile plugin is not in
this image).

Usage:
  python scripts/summarize_trace.py RUNDIR_OR_TRACE [--top 15]
      [--lane REGEX] [--thread REGEX] [--raw] [--json]

RUNDIR_OR_TRACE is either a profile dir written by jax.profiler
(``<dir>/plugins/profile/<ts>/<host>.trace.json.gz`` is located
automatically, newest session wins) or a direct ``*.trace.json.gz`` path.

Lanes follow the trace-viewer model: one process per device/host
(``/device:TPU:0``, ``/host:CPU``), threads within it ("XLA Ops", "Steps",
"python", ...).  Device-lane events are XLA op executions; op names are
normalized (``fusion.123`` -> ``fusion``) so repeated instances aggregate
into op families -- pass --raw for exact names.
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

_INSTANCE_SUFFIX = re.compile(r"\.(?:remat_)?\d+$")


def normalize_op(name: str) -> str:
    """Strip XLA instruction instance suffixes so op families aggregate."""
    prev = None
    while prev != name:
        prev, name = name, _INSTANCE_SUFFIX.sub("", name)
    return name


def find_trace_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        # maybe already pointed inside plugins/profile/<session>
        hits = sorted(glob.glob(os.path.join(path, "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {path!r} (expected a jax.profiler "
            "profile dir or a direct trace file)")
    return hits[-1]


def load_events(trace_path: str):
    opener = gzip.open if trace_path.endswith(".gz") else open
    with opener(trace_path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def summarize(trace_path: str, lane_re: str = "", thread_re: str = "",
              raw: bool = False):
    """Aggregate complete ('X') events per lane.

    Returns {lane_name: {"span_us", "busy_us", "threads", "ops": [
        {"name", "total_us", "count", "avg_us", "pct_of_lane"} ...]}}
    sorted by total time descending within each lane.
    """
    events = load_events(find_trace_file(trace_path))
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"]["name"]

    lane_filter = re.compile(lane_re) if lane_re else None
    thread_filter = re.compile(thread_re) if thread_re else None

    per_lane = defaultdict(lambda: {
        "ops": defaultdict(lambda: [0.0, 0]),   # name -> [total_us, count]
        "threads": set(), "t0": float("inf"), "t1": 0.0, "busy_us": 0.0})
    for e in events:
        if e.get("ph") != "X" or e.get("dur") is None:
            continue
        lane = proc_names.get(e.get("pid"), f"pid:{e.get('pid')}")
        if lane_filter and not lane_filter.search(lane):
            continue
        thread = thread_names.get((e.get("pid"), e.get("tid")),
                                  f"tid:{e.get('tid')}")
        if thread_filter and not thread_filter.search(thread):
            continue
        name = e["name"] if raw else normalize_op(e["name"])
        rec = per_lane[lane]
        tot = rec["ops"][name]
        tot[0] += e["dur"]
        tot[1] += 1
        rec["threads"].add(thread)
        rec["t0"] = min(rec["t0"], e["ts"])
        rec["t1"] = max(rec["t1"], e["ts"] + e["dur"])
        rec["busy_us"] += e["dur"]

    out = {}
    for lane, rec in per_lane.items():
        span = max(rec["t1"] - rec["t0"], 1e-9)
        ops = [{"name": n, "total_us": round(t, 1), "count": c,
                "avg_us": round(t / c, 2),
                "pct_of_lane": round(100.0 * t / span, 1)}
               for n, (t, c) in rec["ops"].items()]
        ops.sort(key=lambda o: -o["total_us"])
        out[lane] = {"span_us": round(span, 1),
                     "busy_us": round(rec["busy_us"], 1),
                     "threads": sorted(rec["threads"]), "ops": ops}
    return out


def _is_device(lane: str) -> bool:
    return lane.lower().startswith("/device")


def print_report(summary, top: int, file=None):
    file = file if file is not None else sys.stdout
    lanes = sorted(summary,
                   key=lambda l: (not _is_device(l),
                                  -summary[l]["busy_us"]))
    for lane in lanes:
        rec = summary[lane]
        kind = "DEVICE" if _is_device(lane) else "host"
        # host lanes nest events (Execute > ExecuteHelper > ...), so the
        # flat sum can exceed the span; device XLA-op lanes do not nest
        print(f"\n== {lane}  [{kind}]  span {rec['span_us']/1e3:.2f} ms, "
              f"sum(events) {rec['busy_us']/1e3:.2f} ms "
              f"({100*rec['busy_us']/rec['span_us']:.0f}%)", file=file)
        print(f"   threads: {', '.join(rec['threads'][:6])}"
              + (" ..." if len(rec["threads"]) > 6 else ""), file=file)
        w = max((len(o["name"]) for o in rec["ops"][:top]), default=4)
        print(f"   {'op':<{w}}  {'total ms':>9}  {'count':>6}  "
              f"{'avg us':>8}  {'% lane':>6}", file=file)
        for o in rec["ops"][:top]:
            print(f"   {o['name']:<{w}}  {o['total_us']/1e3:>9.3f}  "
                  f"{o['count']:>6}  {o['avg_us']:>8.2f}  "
                  f"{o['pct_of_lane']:>6.1f}", file=file)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("path", help="profile dir (runner_config.profile_dir / "
                                "bench.py --trace) or *.trace.json.gz file")
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--lane", default="", help="regex over lane names "
                   "(e.g. '/device' for device lanes only)")
    p.add_argument("--thread", default="", help="regex over thread names "
                   "(e.g. 'XLA Ops')")
    p.add_argument("--raw", action="store_true",
                   help="exact instruction names (no .N suffix folding)")
    p.add_argument("--json", action="store_true",
                   help="machine-readable dump instead of the table")
    args = p.parse_args(argv)

    summary = summarize(args.path, lane_re=args.lane,
                        thread_re=args.thread, raw=args.raw)
    if not summary:
        print("no matching events", file=sys.stderr)
        return 1
    if args.json:
        json.dump(summary, sys.stdout, indent=1)
        print()
    else:
        print_report(summary, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
