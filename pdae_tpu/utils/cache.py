"""Host-feature-keyed persistent compile-cache directories.

XLA:CPU ahead-of-time cache entries embed the *compile* machine's CPU
features; loading one on a host with a different feature set makes
``cpu_aot_loader`` warn about possible SIGILL (MULTICHIP_r03.json's tail
was full of exactly this: the driver replayed ``.jax_cache_cpu`` entries
compiled on the builder's host).  Keying the CPU cache directory by the
host's feature fingerprint makes a feature-mismatched host fall back to a
clean fresh compile instead of loading foreign machine code.

TPU caches don't need this: TPU executables are keyed by the accelerator,
not the host CPU, so ``.jax_cache`` stays unkeyed.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_flags(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """The host CPU's feature-flag set (sorted, deduped), or '' if the
    platform has no /proc/cpuinfo (macOS, containers without procfs)."""
    try:
        with open(cpuinfo_path) as f:
            for line in f:
                # x86 says 'flags', arm64 says 'Features'
                if line.split(":", 1)[0].strip().lower() in ("flags",
                                                             "features"):
                    return " ".join(sorted(set(line.split(":", 1)[1].split())))
    except OSError:
        pass
    return ""


def host_cpu_fingerprint(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """Stable 12-hex-char fingerprint of this host's CPU feature set."""
    basis = f"{platform.machine()}|{_cpu_flags(cpuinfo_path)}"
    return hashlib.sha1(basis.encode()).hexdigest()[:12]


def cpu_cache_dir(root: str) -> str:
    """Per-host-feature subdirectory of ``<root>/.jax_cache_cpu``.

    Entries compiled by a host with different CPU features land in a
    different subdirectory, so they are never loaded here (and vice
    versa) -- the driver's dryrun can no longer SIGILL on a cache
    compiled elsewhere (round-3 verdict item 6)."""
    return os.path.join(root, ".jax_cache_cpu", host_cpu_fingerprint())
