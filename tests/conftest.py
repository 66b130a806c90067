"""Test environment: force an 8-device CPU platform so data-parallel mesh
code paths are exercised without TPU hardware.

NOTE: in this image the axon/TPU PJRT plugin ignores the JAX_PLATFORMS env
var, so we must use the config API before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat test runs skip recompiles.  Keyed by
# host CPU features (pdae_tpu/utils/cache.py) so AOT entries compiled on
# a different machine are never loaded here (SIGILL risk).
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys as _sys

_sys.path.insert(0, _root)
from pdae_tpu.utils.cache import cpu_cache_dir as _ccd

try:
    jax.config.update("jax_compilation_cache_dir", _ccd(_root))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import pytest


@pytest.fixture(autouse=True)
def _restore_op_gates():
    """PDAEService pins ops.set_fused_upsample at construction (one
    service = one numerics); keep that process-global pin from leaking
    between tests."""
    from pdae_tpu import ops
    saved = (ops._FUSED_UPSAMPLE, ops._USE_PALLAS, ops._GN_TRAIN_VJP)
    yield
    ops._FUSED_UPSAMPLE, ops._USE_PALLAS, ops._GN_TRAIN_VJP = saved
