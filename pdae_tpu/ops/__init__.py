"""TPU kernels (Pallas) with jnp fallbacks.

``set_use_pallas(True)`` routes the models' attention through the fused
kernel (models/blocks.py checks this flag); default on for TPU backends.
"""

from .attention import fused_qkv_attention, reference_attention
from .groupnorm import fused_gn_adagn_silu, reference_gn_adagn_silu
from .groupnorm_train import gn_adagn_silu_inline, gn_adagn_silu_train
from .upsample_conv import derive_k4, fused_upsample_conv3x3

_USE_PALLAS = None  # tri-state: None = auto (TPU only)


def set_use_pallas(value):
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    import jax
    return jax.default_backend() == "tpu"


_GN_TRAIN_VJP = None  # tri-state: None = auto (TPU only)


def set_gn_train_vjp(value):
    """Route the ResBlock GN(+AdaGN)+SiLU chains through the stat-caching
    closed-form VJP (ops/groupnorm_train.py).  Forward ops are identical;
    only the backward graph changes.  None = auto (on for TPU)."""
    global _GN_TRAIN_VJP
    _GN_TRAIN_VJP = value


def use_gn_train_vjp() -> bool:
    if _GN_TRAIN_VJP is not None:
        return _GN_TRAIN_VJP
    import jax
    return jax.default_backend() == "tpu"


_FUSED_UPSAMPLE = None  # tri-state: None = auto (TPU, batch >= threshold)
_FUSED_UPSAMPLE_MIN_BATCH = 8


def set_fused_upsample(value):
    """Compute the decoders' ``conv3x3(nearest_up_2x(h))`` as one
    lhs-dilated conv (ops/upsample_conv.py) -- no 4x-larger intermediate,
    2.25x fewer MACs on that conv.  Checkpoint trees are unchanged (the
    4x4 kernel is derived from the stored 3x3 at trace time).  None =
    auto: on for TPU at batch >= 8, off at the small-batch latency
    regime where the lhs-dilated conv tiles worse (chip-measured b1
    @64px: fused 189 ms vs unfused 176 ms DDIM-100 -- PERF.md "128px
    train breakdown"); True/False force it unconditionally."""
    global _FUSED_UPSAMPLE
    _FUSED_UPSAMPLE = value


def _ambient_data_degree() -> int:
    """Data-axis size of the mesh the caller is tracing under (1 without
    one).  The trace-site batch is the GLOBAL batch; on a data-parallel
    mesh each chip sees batch/degree, which is the size that decides
    whether the lhs-dilated conv can fill MXU rows.  Trainers and
    PDAEService trace inside ``with mesh:``, so the ambient mesh is
    visible here."""
    try:
        # jax.interpreters.pxla.thread_resources is deprecated (0.8.2+);
        # the env-carrying object lives in jax._src.mesh
        from jax._src.mesh import thread_resources
        mesh = thread_resources.env.physical_mesh
        if mesh is None or mesh.empty:
            return 1
        from ..parallel import mesh_data_axes
        deg = 1
        for a in mesh_data_axes(mesh):
            deg *= int(mesh.shape[a])
        return max(1, deg)
    except Exception:
        return 1


def use_fused_upsample(batch=None) -> bool:
    """``batch``: static leading-dim size at the trace site; in auto
    mode PER-SHARD batches (global batch / ambient-mesh data degree)
    under ``_FUSED_UPSAMPLE_MIN_BATCH`` keep the unfused form (None = no
    batch information = fused on TPU, as before).  The per-shard divide
    matters: a global batch of 32 on an 8-chip data mesh is 4 per chip --
    exactly the small-batch regime the gate exists to avoid."""
    if _FUSED_UPSAMPLE is not None:
        return _FUSED_UPSAMPLE
    import jax
    if jax.default_backend() != "tpu":
        return False
    if batch is None:
        return True
    return batch // _ambient_data_degree() >= _FUSED_UPSAMPLE_MIN_BATCH


__all__ = ["fused_qkv_attention", "reference_attention",
           "fused_gn_adagn_silu", "reference_gn_adagn_silu",
           "gn_adagn_silu_inline", "gn_adagn_silu_train",
           "fused_upsample_conv3x3", "derive_k4",
           "set_use_pallas", "use_pallas",
           "set_gn_train_vjp", "use_gn_train_vjp",
           "set_fused_upsample", "use_fused_upsample"]
