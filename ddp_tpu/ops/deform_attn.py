"""Multi-scale deformable attention sampling — the reference's #1 native kernel.

The reference imports mmcv's CUDA ``MultiScaleDeformableAttention``
(segmentation/mmseg/models/decode_heads/deformable_head_with_time.py:9-15).
Semantics replicated here (from mmcv's pytorch fallback
``multi_scale_deformable_attn_pytorch``): per level, ``grid_sample`` with
bilinear interpolation, ``align_corners=False`` and zero padding at learned
sampling locations, then a weighted sum over (levels × points).

This module holds two pure-XLA implementations: the oracle (4 gathers + lerp)
and a single-gather 2x2-window fast path. There is deliberately NO Pallas
kernel for MSDA — the measured analysis in ``ddp_tpu/ops/pallas/msda_notes.md``
found the op gather-issue-bound on TPU either way; the TPU-native answer is the
dense shifted-window decoder (``attn_type='window'`` in nn/transformer.py).

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


def _window_sample_level(
    value_l: jnp.ndarray,  # [B, Hl*Wl, H, D]
    hw: Tuple[int, int],
    loc: jnp.ndarray,  # [B, Q, H, P, 2] in [0,1]
) -> jnp.ndarray:
    """Bilinear sampling via ONE 2x2xD-window gather per sampling point.

    Numerically identical to ``_bilinear_sample_level`` (same half-pixel
    convention, zero padding), but issues 4x fewer gather items, each fetching
    a contiguous 2x2xD block — the dominant cost of deformable attention on
    TPU is gather-issue rate, so this is ~4x faster than 4 corner gathers
    (measured on v5e; see ops/pallas/msda_notes.md).

    Returns sampled values [B, Q, H, P, D].
    """
    h, w = hw
    b, _, nh, d = value_l.shape
    q, p = loc.shape[1], loc.shape[3]

    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0).astype(value_l.dtype)
    ty = (y - y0).astype(value_l.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Pad by 1 on each spatial side so every in-range window is fetchable;
    # fully out-of-range windows are clamped to a valid start and their
    # contribution is zeroed by the corner masks below.
    v = value_l.reshape(b, h, w, nh, d)
    vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    ys = jnp.clip(y0i + 1, 0, h)  # window start rows in padded coords
    xs = jnp.clip(x0i + 1, 0, w)

    # one gather per (b, head): operand [h+2, w+2, d], starts [Q*P, 2]
    def gather_bh(op, starts):
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        return jax.lax.gather(
            op, starts, dnums, slice_sizes=(2, 2, op.shape[-1]),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            indices_are_sorted=False, unique_indices=False,
        )  # [Q*P, 2, 2, D]

    starts = jnp.stack([ys, xs], axis=-1)  # [B, Q, H, P, 2]
    starts = jnp.transpose(starts, (0, 2, 1, 3, 4)).reshape(b, nh, q * p, 2)
    op = jnp.transpose(vp, (0, 3, 1, 2, 4))  # [B, H, h+2, w+2, D]
    windows = jax.vmap(jax.vmap(gather_bh))(op, starts)  # [B,H,Q*P,2,2,D]
    windows = windows.reshape(b, nh, q, p, 2, 2, d)
    windows = jnp.transpose(windows, (0, 2, 1, 3, 4, 5, 6))  # [B,Q,H,P,2,2,D]

    # corner validity from TRUE (unclamped) coordinates
    def inside(yi, xi):
        return ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).astype(value_l.dtype)

    m00 = inside(y0i, x0i)
    m01 = inside(y0i, x0i + 1)
    m10 = inside(y0i + 1, x0i)
    m11 = inside(y0i + 1, x0i + 1)
    w00 = (1 - ty) * (1 - tx) * m00
    w01 = (1 - ty) * tx * m01
    w10 = ty * (1 - tx) * m10
    w11 = ty * tx * m11
    cw = jnp.stack([w00, w01, w10, w11], axis=-1)  # [B,Q,H,P,4]
    wins = windows.reshape(b, q, nh, p, 4, d)
    return jnp.sum(wins * cw[..., None], axis=4)  # [B,Q,H,P,D]


def ms_deform_attn_window(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Window-gather MSDA — the TPU fast path (same semantics as _xla)."""
    b, _, nh, d = value.shape
    q = sampling_locations.shape[1]
    out = jnp.zeros((b, q, nh, d), dtype=value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        v_l = jax.lax.dynamic_slice_in_dim(value, start, n, axis=1)
        loc = sampling_locations[:, :, :, lvl]
        sampled = _window_sample_level(v_l, (h, w), loc)
        wts = attention_weights[:, :, :, lvl][..., None]
        out = out + jnp.sum(sampled * wts, axis=3)
        start += n
    return out.reshape(b, q, nh * d)


def ms_deform_attn_hybrid(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Window-gather FORWARD + 4-corner BACKWARD (custom VJP).

    Round-4 bisect result (tools/bisect_msda_train.py, msda_train_notes.md):
    compiling the TRANSPOSE of the vmap'd 2x2-block ``lax.gather`` — a
    block-slice scatter-add — reliably crashes the v5e TPU worker (libtpu
    fault), with and without remat, at every batch size tried; the 4-corner
    ``take_along_axis`` formulation's backward (a standard element scatter-
    add) compiles and trains. The two forwards are numerically identical
    (same half-pixel convention, same zero padding), so this hybrid keeps
    the measured-4x-faster window gather on the inference path while routing
    gradients through the formulation the chip can actually compile.
    """

    @jax.custom_vjp
    def f(value, loc, w):
        return ms_deform_attn_window(value, spatial_shapes, loc, w)

    def f_fwd(value, loc, w):
        return f(value, loc, w), (value, loc, w)

    def f_bwd(res, g):
        value, loc, w = res
        _, vjp = jax.vjp(
            lambda v, l, ww: ms_deform_attn_xla(v, spatial_shapes, l, ww),
            value, loc, w)
        return vjp(g)

    f.defvjp(f_fwd, f_bwd)
    return f(value, sampling_locations, attention_weights)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching entry point.

    ``spatial_shapes`` must be static (python ints) — required for one-shot XLA
    compilation.

    impl: 'auto' (hybrid on TPU, plain gather elsewhere), 'window' (2x2-block
    gather fwd AND bwd — its backward crashes libtpu on v5e, kept for
    bisection), 'xla' (4-corner gathers), or 'hybrid' (window fwd, 4-corner
    bwd — the TPU default; see ms_deform_attn_hybrid). A hand-written Pallas
    kernel is NOT provided deliberately: Mosaic cannot express multi-vreg
    dynamic gathers (verified on v5e), so the windowed lax.gather IS the
    TPU-native implementation; see ops/pallas/msda_notes.md for the
    measurements behind this decision.

    The DDP_MSDA_IMPL env var overrides 'auto' (bisect tool
    tools/bisect_msda_train.py; msda_train_notes.md records why).
    """
    if impl == "auto":
        import os

        impl = os.environ.get("DDP_MSDA_IMPL") or (
            "hybrid" if jax.default_backend() == "tpu" else "xla")
    if impl == "hybrid":
        return ms_deform_attn_hybrid(
            value, spatial_shapes, sampling_locations, attention_weights)
    if impl == "window":
        return ms_deform_attn_window(
            value, spatial_shapes, sampling_locations, attention_weights)
    return ms_deform_attn_xla(value, spatial_shapes, sampling_locations, attention_weights)
