"""Parameter-tree partitioning: the functional replacement for
``requires_grad_(False)`` freezing.

The PDAE decoder trains only ``label_emb`` + the shift branch while the
pre-trained DPM trunk stays frozen (reference shift_unet.py:299-310 and the
optimizer param groups at train_representation_learning.py:58-70).  Here
"freeze" means: split the param dict into (trainable, frozen), differentiate
and optimize only the trainable subtree, and merge for ``apply``.  Frozen
params are bit-identical across steps by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

from ..models.shift_unet import SHIFT_TRAINABLE_PREFIXES


def split_params(params: Dict, prefixes: Tuple[str, ...]) -> Tuple[Dict, Dict]:
    """Split a top-level param dict into (matching, rest)."""
    inside = {k: v for k, v in params.items() if k.startswith(prefixes)}
    outside = {k: v for k, v in params.items() if not k.startswith(prefixes)}
    return inside, outside


def merge_params(a: Dict, b: Dict) -> Dict:
    out = dict(a)
    out.update(b)
    return out


def split_shift_unet(params: Dict) -> Tuple[Dict, Dict]:
    """(trainable shift branch, frozen DPM trunk)."""
    return split_params(params, SHIFT_TRAINABLE_PREFIXES)
