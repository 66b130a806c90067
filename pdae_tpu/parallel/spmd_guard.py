"""Guard against silent SPMD partitioning degradation.

XLA's partitioner reports pathologies (e.g. "Involuntary full
rematerialization", where a tensor is replicated to every device as the
last-resort resharding) only as C++ absl WARNING log lines on fd 2 --
compilation still succeeds and the program runs, just slowly.  That is
how a TP-layout full-replication resharding once shipped inside an
``ok: true`` validation artifact (MULTICHIP_r02.json).  This module
captures OS-level stderr around a compile/run block and turns those
warnings into hard failures.

The capture is fd-level (``dup2``) because the lines come from XLA's C++
logging, which python-level ``sys.stderr`` redirection never sees.
Everything captured is re-emitted to the real stderr afterwards so driver
logs / test output stay intact.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile

# substrings of XLA spmd_partitioner.cc warnings that mean "your sharding
# annotations forced a degenerate partitioning"
DEGRADATION_MARKERS = (
    "Involuntary full rematerialization",
)


class SpmdDegradationError(AssertionError):
    """A compile under ``spmd_degradation_check`` hit a partitioner
    last-resort (see DEGRADATION_MARKERS); the offending log lines are in
    ``self.lines``."""

    def __init__(self, lines):
        self.lines = list(lines)
        super().__init__(
            "XLA SPMD partitioner degradation detected:\n"
            + "\n".join(self.lines))


@contextlib.contextmanager
def capture_stderr_fd():
    """Capture everything written to OS fd 2 (python AND native) inside
    the block; yields a zero-arg callable valid AFTER the block returning
    the captured text.  The text is re-emitted to the real stderr on
    exit."""
    result = {"text": ""}
    try:
        saved = os.dup(2)
    except OSError:
        # no real fd 2 (exotic embedding): degrade to no-op capture
        yield lambda: result["text"]
        return
    tmp = tempfile.TemporaryFile(mode="w+b")
    try:
        sys.stderr.flush()
    except Exception:
        pass
    os.dup2(tmp.fileno(), 2)
    try:
        yield lambda: result["text"]
    finally:
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(saved, 2)
        os.close(saved)
        tmp.seek(0)
        result["text"] = tmp.read().decode(errors="replace")
        tmp.close()
        if result["text"]:
            try:
                sys.stderr.write(result["text"])
                sys.stderr.flush()
            except Exception:
                pass


def degradation_lines(text: str):
    """The stderr lines that match a known SPMD-degradation marker."""
    return [ln for ln in text.splitlines()
            if any(m in ln for m in DEGRADATION_MARKERS)]


@contextlib.contextmanager
def spmd_degradation_check():
    """Run a block of jit compiles/executions; raise
    ``SpmdDegradationError`` if the partitioner logged a degradation
    warning for any program compiled inside it."""
    with capture_stderr_fd() as get_text:
        yield
    bad = degradation_lines(get_text())
    if bad:
        raise SpmdDegradationError(bad)
