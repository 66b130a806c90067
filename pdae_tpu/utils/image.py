"""Image grid saving and [-1,1] <-> uint8 conversions.

Replaces the reference's matplotlib grid helper
(``/root/reference/utils/utils.py:91-150``) with a PIL-based paste grid
(no figure machinery on the hot path); supports the gt/result merged
variants used by the samplers."""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 NHWC."""
    x = np.asarray(x, dtype=np.float32)
    x = (x + 1.0) * 127.5
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def from_uint8(x: np.ndarray) -> np.ndarray:
    """uint8 NHWC -> [-1,1] float32 NHWC."""
    return np.asarray(x, dtype=np.float32) / 127.5 - 1.0


def x0_from_transfer(x):
    """Batch ``x_0`` as transferred -> model-ready float [-1,1].

    Identity for float inputs.  For ``transfer_uint8`` batches (raw uint8
    pixels, 4x fewer host->device bytes -- datasets.py::_finalize) it
    applies the EXACT host op sequence (/255.0 then *2.0-1.0, fp32) on
    device, so the uint8 path is bitwise identical to host-side float
    normalization (tests/test_transfer_diet.py).  jit-safe: dtype is
    static metadata, each transfer mode compiles its own program."""
    import jax.numpy as jnp
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return x


def make_grid(images: np.ndarray, nrow: Optional[int] = None,
              pad: int = 2, pad_value: int = 255) -> np.ndarray:
    """Tile a [N,H,W,C] uint8 batch into one image array."""
    images = np.asarray(images)
    assert images.dtype == np.uint8 and images.ndim == 4
    n, h, w, c = images.shape
    if nrow is None:
        nrow = int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    grid = np.full((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                   pad_value, dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y, x = pad + r * (h + pad), pad + col * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: Optional[int] = None,
                    gts: Optional[np.ndarray] = None) -> None:
    """Save a sample grid PNG; with ``gts`` interleave ground-truth rows
    (the reference's gt/result merge variants, utils/utils.py:100-150)."""
    from PIL import Image
    if gts is not None:
        stacked = []
        for g, im in zip(gts, images):
            stacked.extend([g, im])
        images = np.stack(stacked)
        nrow = nrow or 2
    grid = make_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(grid).save(path)


def paste_rows(rows: Sequence[np.ndarray], path: str) -> None:
    """Paste a list of [N,H,W,C] uint8 rows vertically into one PNG
    (sampler-style merged outputs)."""
    from PIL import Image
    row_imgs = [make_grid(r, nrow=r.shape[0]) for r in rows]
    widths = [r.shape[1] for r in row_imgs]
    wmax = max(widths)
    padded = []
    for r in row_imgs:
        if r.shape[1] < wmax:
            pad = np.full((r.shape[0], wmax - r.shape[1], r.shape[2]), 255,
                          np.uint8)
            r = np.concatenate([r, pad], axis=1)
        padded.append(r)
    merged = np.concatenate(padded, axis=0)
    if merged.shape[-1] == 1:
        merged = merged[..., 0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(merged).save(path)
