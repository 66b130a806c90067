"""TPU kernels (Pallas) with jnp fallbacks.

``set_use_pallas(True)`` routes the models' attention through the fused
kernel (models/blocks.py checks this flag); default on for TPU backends.
"""

from .attention import fused_qkv_attention, reference_attention
from .groupnorm import fused_gn_adagn_silu, reference_gn_adagn_silu

_USE_PALLAS = None  # tri-state: None = auto (TPU only)


def set_use_pallas(value):
    global _USE_PALLAS
    _USE_PALLAS = value


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    import jax
    return jax.default_backend() == "tpu"


__all__ = ["fused_qkv_attention", "reference_attention",
           "fused_gn_adagn_silu", "reference_gn_adagn_silu",
           "set_use_pallas", "use_pallas"]
