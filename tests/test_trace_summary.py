"""Trace summarizer: real jax.profiler capture -> top-op table.

Replaces the reference's host-side phase meters
(/root/reference/trainer/train_regular_diffusion.py:62-123) with
profiler-truth attribution; stdlib-only parsing of the trace-event JSON.
"""

import json
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo/scripts")
from summarize_trace import (find_trace_file, main, normalize_op,
                             summarize)


@pytest.fixture(scope="module")
def trace_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prof"))
    f = jax.jit(lambda x: jnp.tanh(x @ x))
    x = jnp.ones((128, 128), jnp.float32)
    f(x).block_until_ready()
    jax.profiler.start_trace(d)
    for _ in range(3):
        f(x).block_until_ready()
    jax.profiler.stop_trace()
    return d


def test_normalize_op():
    assert normalize_op("fusion.123") == "fusion"
    assert normalize_op("convolution.4.remat_2") == "convolution"
    assert normalize_op("dot_general") == "dot_general"
    assert normalize_op("loop_add_fusion.12") == "loop_add_fusion"


def test_find_trace_file(trace_dir):
    p = find_trace_file(trace_dir)
    assert p.endswith(".trace.json.gz")
    assert find_trace_file(p) == p
    with pytest.raises(FileNotFoundError):
        find_trace_file(str(trace_dir) + "/nonexistent")


def test_summarize_real_trace(trace_dir):
    summary = summarize(trace_dir)
    assert summary, "no lanes parsed"
    # the executed program must show up in some lane
    all_ops = {o["name"] for rec in summary.values() for o in rec["ops"]}
    assert any("dot" in n or "tanh" in n or "jit" in n.lower()
               for n in all_ops), sorted(all_ops)
    for rec in summary.values():
        assert rec["span_us"] > 0
        # ops sorted by total time descending
        totals = [o["total_us"] for o in rec["ops"]]
        assert totals == sorted(totals, reverse=True)
        for o in rec["ops"]:
            assert o["count"] >= 1
            # total_us and avg_us are independently rounded
            assert o["avg_us"] == pytest.approx(
                o["total_us"] / o["count"], rel=0.02, abs=0.06)


def test_lane_and_thread_filters(trace_dir):
    everything = summarize(trace_dir)
    none = summarize(trace_dir, lane_re="no_such_lane_zzz")
    assert none == {}
    # filtering by an existing lane keeps only it
    lane = next(iter(everything))
    only = summarize(trace_dir, lane_re=lane.replace("/", "."))
    assert set(only) <= set(everything)
    assert only


def test_cli_json(trace_dir, capsys):
    rc = main([trace_dir, "--json", "--top", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    parsed = json.loads(out)
    assert parsed


def test_cli_table(trace_dir, capsys):
    rc = main([trace_dir, "--top", "3", "--raw"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "span" in out and "sum(events)" in out
