"""scripts/memory_report.py smoke: compiles the tiny-geometry programs on
CPU and checks the XLA memory-analysis JSON shape.  The real (chip)
numbers live in PERF.md "HBM footprint"."""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def test_memory_report_tiny(capsys):
    sys.path.insert(0, os.path.join(os.path.dirname(HERE), "scripts"))
    import memory_report
    memory_report.main(["--tiny", "--platform", "cpu",
                        "--programs", "train64:off,sample64"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for prog in ("train64:off", "sample64"):
        m = out[prog]
        assert m["temp_mb"] > 0 and m["argument_mb"] > 0
    # a train step's temp footprint exceeds the eval scan's
    assert out["train64:off"]["temp_mb"] > out["sample64"]["temp_mb"]
