"""Multi-scale deformable attention sampling — the reference's #1 native kernel.

The reference imports mmcv's CUDA ``MultiScaleDeformableAttention``
(segmentation/mmseg/models/decode_heads/deformable_head_with_time.py:9-15).
Semantics replicated here (from mmcv's pytorch fallback
``multi_scale_deformable_attn_pytorch``): per level, ``grid_sample`` with
bilinear interpolation, ``align_corners=False`` and zero padding at learned
sampling locations, then a weighted sum over (levels × points).

This module holds the pure-XLA implementation (gather + lerp), which serves as
the correctness oracle and CPU fallback; the Pallas TPU kernel lives in
``ddp_tpu.ops.pallas.msda`` and is dispatched via ``ms_deform_attn`` when
running on TPU with supported shapes.

Layouts (batch-first, TPU-native):
  value:              [B, S, H, D]   (S = sum_l H_l*W_l tokens, H heads)
  sampling_locations: [B, Q, H, L, P, 2]  normalized to [0, 1] per level (x, y)
  attention_weights:  [B, Q, H, L, P]     softmaxed over L*P
  output:             [B, Q, H*D]
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_level(
    value_l: jnp.ndarray,  # [B, Hl*Wl, H, D]
    hw: Tuple[int, int],
    loc: jnp.ndarray,  # [B, Q, H, P, 2] in [0,1]
) -> jnp.ndarray:
    """grid_sample(align_corners=False, padding_mode='zeros') at ``loc``.

    Returns sampled values [B, Q, H, P, D].
    """
    h, w = hw
    # Convert normalized [0,1] coords to pixel coords with half-pixel centers:
    # grid_sample(align_corners=False) maps g in [-1,1] to ((g+1)*size-1)/2;
    # with g = 2*loc-1 that is loc*size - 0.5.
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        flat = yi_c * w + xi_c  # [B, Q, H, P]
        # value_l: [B, S, H, D] -> gather along S per (B, H)
        # rearrange for take_along_axis: [B, H, S, D] vs idx [B, H, Q*P, 1]
        v = jnp.swapaxes(value_l, 1, 2)  # [B, H, S, D]
        b, nh, q, p = flat.shape[0], flat.shape[2], flat.shape[1], flat.shape[3]
        idx = jnp.transpose(flat, (0, 2, 1, 3)).reshape(b, nh, q * p, 1)
        g = jnp.take_along_axis(v, idx, axis=2)  # [B, H, Q*P, D]
        g = g.reshape(b, nh, q, p, -1)
        g = jnp.transpose(g, (0, 2, 1, 3, 4))  # [B, Q, H, P, D]
        return g * inside[..., None].astype(g.dtype)

    w00 = ((1 - tx) * (1 - ty))[..., None]
    w01 = (tx * (1 - ty))[..., None]
    w10 = ((1 - tx) * ty)[..., None]
    w11 = (tx * ty)[..., None]
    out = (
        corner(x0i, y0i) * w00
        + corner(x0i + 1, y0i) * w01
        + corner(x0i, y0i + 1) * w10
        + corner(x0i + 1, y0i + 1) * w11
    )
    return out


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention core. See module docstring."""
    b, _, nh, d = value.shape
    q = sampling_locations.shape[1]
    out = jnp.zeros((b, q, nh, d), dtype=value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        v_l = jax.lax.dynamic_slice_in_dim(value, start, n, axis=1)
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 2]
        sampled = _bilinear_sample_level(v_l, (h, w), loc)  # [B, Q, H, P, D]
        wts = attention_weights[:, :, :, lvl][..., None]  # [B, Q, H, P, 1]
        out = out + jnp.sum(sampled * wts, axis=3)
        start += n
    return out.reshape(b, q, nh * d)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    use_pallas: bool = "auto",
) -> jnp.ndarray:
    """Dispatching entry point: Pallas TPU kernel when available, XLA fallback.

    ``spatial_shapes`` must be static (python ints) — required for one-shot XLA
    compilation and for the Pallas grid.
    """
    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            from .pallas.msda import ms_deform_attn_pallas

            return ms_deform_attn_pallas(
                value, spatial_shapes, sampling_locations, attention_weights
            )
        except (ImportError, NotImplementedError):
            pass
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations, attention_weights)
