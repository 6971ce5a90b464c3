"""Time-conditioned deformable-attention transformer encoder — the DDP
denoising decoder's compute core.

Parity targets (studied, not copied):
  - mmcv ``MultiScaleDeformableAttention`` module semantics (query+pos →
    sampling offsets / softmax weights; value projection; bilinear sampling;
    output projection; residual), including its special offset-bias
    initialization (ring of unit vectors scaled by point index).
  - ``BaseTransformerLayer`` with operation_order ('self_attn','norm','ffn',
    'norm') and post-layer FiLM time conditioning: time → SiLU → Linear(4C→2C),
    query = query*(scale+1)+shift
    (segmentation/mmseg/models/utils/transformer.py:273-278,413-417).
  - ``DetrTransformerEncoder`` num_layers=6 (config
    configs/ade/ddp_swin_t...py:81-97).

Layout is batch-first [B, S, C] (TPU-native), unlike the reference's [S, B, C].
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_attn import ms_deform_attn
from .common import Mlp


def _offset_bias_init(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """mmcv's grid-like sampling-offset bias init: per head a unit vector on a
    ring at angle 2π·h/H, L∞-normalized, tiled over levels and scaled by
    (point_index + 1)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # [H, 2]
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1).astype(np.float32)


def reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Per-token normalized cell-center reference points, concat over levels.

    Matches DeformableHeadWithTime.get_reference_points
    (deformable_head_with_time.py:64-88): linspace(0.5, H-0.5)/H per axis.
    Returns [S, L, 2] (x, y) with the level axis broadcast (every token gets
    the same point for all levels, as in the reference).
    """
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        ref_y, ref_x = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([ref_x.reshape(-1), ref_y.reshape(-1)], axis=-1))
    ref = np.concatenate(pts, axis=0)  # [S, 2]
    num_levels = len(spatial_shapes)
    return np.tile(ref[:, None, :], (1, num_levels, 1))


class DeformableAttention(nn.Module):
    """Multi-scale deformable attention (1 level in all DDP configs)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, S, C]
        value: jnp.ndarray,  # [B, S, C]
        query_pos: Optional[jnp.ndarray],  # [S, C] or [B, S, C]
        ref_points: jnp.ndarray,  # [S, L, 2]
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        b, s, c = query.shape
        h, l, p = self.num_heads, self.num_levels, self.num_points
        head_dim = c // h
        identity = query
        if query_pos is not None:
            query = query + query_pos

        offsets = nn.Dense(
            h * l * p * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(_offset_bias_init(h, l, p)),
            name="sampling_offsets",
        )(query).reshape(b, s, h, l, p, 2)
        weights = nn.Dense(
            h * l * p,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, s, h, l * p)
        weights = jax.nn.softmax(weights, axis=-1).reshape(b, s, h, l, p)

        v = nn.Dense(c, name="value_proj", kernel_init=nn.initializers.xavier_uniform())(
            value
        ).reshape(b, s, h, head_dim)

        # offsets are in pixels of each level; normalize by (W_l, H_l)
        normalizer = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], dtype=query.dtype
        )  # [L, 2] as (x, y) divisors
        loc = ref_points[None, :, None, :, None, :] + offsets / normalizer[None, None, None, :, None, :]

        out = ms_deform_attn(v, spatial_shapes, loc, weights)
        out = nn.Dense(c, name="output_proj", kernel_init=nn.initializers.xavier_uniform())(out)
        return identity + out


class TimeFiLMEncoderLayer(nn.Module):
    """Post-norm DETR encoder layer with trailing FiLM time modulation."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    ffn_dim: int = 1024
    use_time: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, S, C]
        time: Optional[jnp.ndarray],  # [B, 4C]
        query_pos: Optional[jnp.ndarray],
        ref_points: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        query = DeformableAttention(
            self.embed_dims, self.num_heads, self.num_levels, self.num_points,
            name="attn",
        )(query, query, query_pos, ref_points, spatial_shapes)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        query = query + Mlp(self.ffn_dim, self.embed_dims, act=nn.gelu, name="ffn")(query)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query)
        if self.use_time and time is not None:
            t = nn.Dense(self.embed_dims * 2, name="time_mlp")(nn.silu(time))
            scale, shift = jnp.split(t[:, None, :], 2, axis=-1)  # [B,1,C] each
            query = query * (scale + 1.0) + shift
        return query


class TimeFiLMEncoder(nn.Module):
    """Stack of ``num_layers`` TimeFiLMEncoderLayer (DetrTransformerEncoder)."""

    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    ffn_dim: int = 1024
    use_time: bool = True

    @nn.compact
    def __call__(self, query, time, query_pos, ref_points, spatial_shapes):
        for i in range(self.num_layers):
            query = TimeFiLMEncoderLayer(
                self.embed_dims, self.num_heads, self.num_levels, self.num_points,
                self.ffn_dim, self.use_time, name=f"layer{i}",
            )(query, time, query_pos, ref_points, spatial_shapes)
        return query
