"""fd-level stderr filter for XLA:CPU AOT pseudo-feature warnings.

Loading a persistent-cache entry written by THIS host still logs two
~2KB ``cpu_aot_loader.cc`` error lines per program ("Target machine
feature +prefer-no-scatter/+prefer-no-gather is not supported ... could
lead to execution errors such as SIGILL"): the mismatching "features"
are XLA tuning pseudo-flags the compiler bakes into the AOT result, not
real CPU features, so they never appear in the host's /proc/cpuinfo set
(utils/cache.py keys the cache dir on the REAL feature fingerprint and
cannot silence these).  They are a same-host false positive, but they
are emitted from native code at ERROR level straight to fd 2 -- Python
logging never sees them -- and a handful of them buries any artifact
tail (MULTICHIP_r04: a single line filled the driver's whole 2000-char
window).

``aot_pseudo_feature_filter()`` dup2-redirects fd 2 through a pipe; a
pump thread forwards every line to the real stderr EXCEPT the
cpu_aot_loader feature-mismatch lines, which it counts.  The count is
reported so the suppression is auditable, not silent.
"""

from __future__ import annotations

import os
import threading

# both the warning header and its continuation are single (very long)
# lines containing these markers
_MARKERS = (b"cpu_aot_loader", b"Target machine feature")


class aot_pseudo_feature_filter:
    """Context manager: swallow + count cpu_aot_loader feature-mismatch
    stderr lines; everything else passes through unchanged.

    ``.count`` holds the number of suppressed lines after exit."""

    def __init__(self):
        self.count = 0

    def __enter__(self):
        self._real_fd = os.dup(2)
        r, w = os.pipe()
        os.dup2(w, 2)
        os.close(w)
        self._thread = threading.Thread(target=self._pump, args=(r,),
                                        daemon=True)
        self._thread.start()
        return self

    def _pump(self, r: int):
        buf = b""
        while True:
            try:
                chunk = os.read(r, 1 << 16)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for line in lines:
                self._emit(line + b"\n")
        if buf:
            self._emit(buf)
        os.close(r)

    def _emit(self, line: bytes):
        if any(m in line for m in _MARKERS):
            self.count += 1
            return
        try:
            os.write(self._real_fd, line)
        except OSError:
            pass

    def __exit__(self, *exc):
        # restoring fd 2 closes the pipe's only write end -> pump EOFs
        os.dup2(self._real_fd, 2)
        self._thread.join(timeout=5)
        os.close(self._real_fd)
        return False
