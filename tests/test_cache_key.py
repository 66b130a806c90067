"""Host-feature-keyed compile cache (utils/cache.py).

Round-3 verdict item 6: the dryrun's persistent CPU cache must never load
AOT entries compiled on a host with different CPU features (SIGILL risk,
MULTICHIP_r03.json tail).  The fix keys the directory by a fingerprint of
the host's feature set -- these tests pin the fingerprint's determinism,
feature sensitivity, and robustness to a missing /proc/cpuinfo.
"""

import os

from pdae_tpu.utils.cache import (_cpu_flags, cpu_cache_dir,
                                  host_cpu_fingerprint)


pytestmark = __import__("pytest").mark.quick  # fast tier (pytest.ini)

def test_fingerprint_deterministic():
    assert host_cpu_fingerprint() == host_cpu_fingerprint()
    fp = host_cpu_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)


def test_fingerprint_changes_with_features(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_text("processor: 0\nflags\t\t: fpu sse sse2 avx avx2\n")
    b.write_text("processor: 0\nflags\t\t: fpu sse sse2 avx avx2 avx512f\n")
    fa = host_cpu_fingerprint(str(a))
    fb = host_cpu_fingerprint(str(b))
    assert fa != fb


def test_flag_order_and_duplicates_ignored(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_text("flags: avx sse fpu\n")
    b.write_text("flags: fpu sse avx avx\n")
    assert host_cpu_fingerprint(str(a)) == host_cpu_fingerprint(str(b))


def test_arm_features_line(tmp_path):
    f = tmp_path / "cpuinfo"
    f.write_text("processor: 0\nFeatures\t: fp asimd evtstrm aes\n")
    assert _cpu_flags(str(f)) == "aes asimd evtstrm fp"


def test_missing_cpuinfo_is_not_fatal(tmp_path):
    # macOS / stripped containers: no /proc/cpuinfo -> arch-only key
    fp = host_cpu_fingerprint(str(tmp_path / "missing"))
    assert len(fp) == 12


def test_cache_dir_is_keyed_subdir(tmp_path):
    d = cpu_cache_dir(str(tmp_path))
    assert os.path.dirname(d) == str(tmp_path / ".jax_cache_cpu")
    assert os.path.basename(d) == host_cpu_fingerprint()


def test_conftest_uses_keyed_dir():
    # the live test session's cache config must point INSIDE the keyed
    # subdir (a regression here would resurrect the foreign-AOT load).
    # Another test may have legitimately re-pointed the config by running
    # a script main() in-process (e.g. test_headline_eval) -- only judge
    # the value when it still claims to be OUR keyed CPU tree, so the
    # check is order-independent (advisor round-4 finding).
    import jax

    configured = jax.config.jax_compilation_cache_dir
    if not configured:  # config API absent in this jax
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    keyed_root = os.path.join(root, ".jax_cache_cpu")
    if not configured.startswith(keyed_root):
        import pytest
        pytest.skip(f"cache dir re-pointed by an earlier in-process "
                    f"main(): {configured}")
    assert configured == cpu_cache_dir(root)
