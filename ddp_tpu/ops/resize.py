"""Image resize ops with PyTorch-compatible sampling conventions.

The reference pipelines lean on ``F.interpolate`` (via mmseg.ops.resize,
segmentation/mmseg/ops/wrappers.py:8) with three conventions we must match for
numerical parity when importing torch-trained weights:

  - bilinear, align_corners=False  (half-pixel centers) — the DDP default
  - bilinear, align_corners=True   (corner-aligned grid)
  - nearest                        (torch 'asymmetric' floor convention)

Layout is NHWC. All paths are static-shape and jit/vmap friendly; the bilinear
paths reduce to two small dense gathers + lerps which XLA fuses well.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gather_axis(x: jnp.ndarray, idx: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, idx, axis=axis)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize, torch convention: src = floor(dst * in/out).

    x: [..., H, W, C] -> [..., size[0], size[1], C].
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    ih = np.floor(np.arange(oh) * (h / oh)).astype(np.int32)
    iw = np.floor(np.arange(ow) * (w / ow)).astype(np.int32)
    ih = np.clip(ih, 0, h - 1)
    iw = np.clip(iw, 0, w - 1)
    x = _gather_axis(x, jnp.asarray(ih), axis=-3)
    x = _gather_axis(x, jnp.asarray(iw), axis=-2)
    return x


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Source indices (lo, hi) and lerp weight for 1-D linear resize."""
    if align_corners and out_size > 1:
        src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def resize_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize matching torch ``F.interpolate(mode='bilinear')``.

    x: [..., H, W, C] -> [..., size[0], size[1], C]. Interpolation runs in the
    input dtype's accumulation type (float32 for bf16 inputs).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    lo_h, hi_h, wh = _linear_weights(h, oh, align_corners)
    lo_w, hi_w, ww = _linear_weights(w, ow, align_corners)

    top = _gather_axis(xf, jnp.asarray(lo_h), axis=-3)
    bot = _gather_axis(xf, jnp.asarray(hi_h), axis=-3)
    wh_ = jnp.asarray(wh)[..., :, None, None]
    xf = top * (1.0 - wh_) + bot * wh_

    left = _gather_axis(xf, jnp.asarray(lo_w), axis=-2)
    right = _gather_axis(xf, jnp.asarray(hi_w), axis=-2)
    ww_ = jnp.asarray(ww)[..., :, None]
    xf = left * (1.0 - ww_) + right * ww_
    return xf.astype(dtype)


def resize(
    x: jnp.ndarray,
    size: Tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Dispatching resize mirroring mmseg.ops.resize semantics (NHWC)."""
    if mode == "nearest":
        return resize_nearest(x, size)
    if mode == "bilinear":
        return resize_bilinear(x, size, align_corners)
    raise ValueError(f"unsupported resize mode {mode!r}")
