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
    residual: bool = True  # False: return raw attn output (V2 pre-norm layers)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Q, C]
        value: jnp.ndarray,  # [B, S, C] (S = sum_l H_l*W_l; Q may differ)
        query_pos: Optional[jnp.ndarray],  # [Q, C] or [B, Q, C]
        ref_points: jnp.ndarray,  # [Q, L, 2] static or [B, Q, L, 2] learned
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
        ).reshape(b, value.shape[1], h, head_dim)

        # offsets are in pixels of each level; normalize by (W_l, H_l)
        normalizer = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], dtype=query.dtype
        )  # [L, 2] as (x, y) divisors
        if ref_points.ndim == 3:  # static per-token [Q, L, 2]
            refs = ref_points[None, :, None, :, None, :]
        else:  # learned per-batch [B, Q, L, 2] (HAHI cross-attention)
            refs = ref_points[:, :, None, :, None, :]
        loc = refs + offsets / normalizer[None, None, None, :, None, :]

        out = ms_deform_attn(v, spatial_shapes, loc, weights)
        out = nn.Dense(c, name="output_proj", kernel_init=nn.initializers.xavier_uniform())(out)
        return identity + out if self.residual else out


class TimeFiLMEncoderLayer(nn.Module):
    """DETR encoder layer with FiLM time modulation, in the reference's three
    variants (transformer.py BaseTransformerLayer / V2 / V3):

      v1 — post-norm attn→norm→ffn→norm, ONE trailing FiLM
           (time → SiLU → Linear(4C→2C); query·(scale+1)+shift).
      v2 — pre-norm: q += FiLM1(attn(norm1(q))); q += FiLM2(ffn(norm2(q)))
           with a Linear(4C→4C) time MLP chunked (scale1, scale2, shift1,
           shift2) (transformer.py:609-632).
      v3 — post-norm like v1, but FiLM after EACH norm with its own
           scale/shift pair (transformer.py:829-855).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    ffn_dim: int = 1024
    use_time: bool = True
    attn_type: str = "msda"  # 'msda' (faithful) | 'window' (TPU-native dense)
    window: int = 8
    shift: int = 0
    film: str = "v1"  # 'v1' | 'v2' | 'v3'

    def _attn(self, query, query_pos, ref_points, spatial_shapes,
              residual=True):
        if self.attn_type == "window":
            return WindowSelfAttention(
                self.embed_dims, self.num_heads, self.window, self.shift,
                residual=residual, name="attn",
            )(query, query_pos, spatial_shapes[0])
        return DeformableAttention(
            self.embed_dims, self.num_heads, self.num_levels, self.num_points,
            residual=residual, name="attn",
        )(query, query, query_pos, ref_points, spatial_shapes)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, S, C]
        time: Optional[jnp.ndarray],  # [B, 4C]
        query_pos: Optional[jnp.ndarray],
        ref_points: jnp.ndarray,
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        timed = self.use_time and time is not None
        if self.film in ("v2", "v3"):
            if timed:
                t = nn.Dense(self.embed_dims * 4, name="time_mlp")(nn.silu(time))
                s1, s2, sh1, sh2 = jnp.split(t[:, None, :], 4, axis=-1)
            else:
                s1 = s2 = sh1 = sh2 = None

            def film(x, s, sh):
                return x * (s + 1.0) + sh if timed else x

            if self.film == "v2":
                y = self._attn(nn.LayerNorm(epsilon=1e-5, name="norm1")(query),
                               query_pos, ref_points, spatial_shapes,
                               residual=False)
                query = query + film(y, s1, sh1)
                y = Mlp(self.ffn_dim, self.embed_dims, act=nn.gelu,
                        name="ffn")(nn.LayerNorm(epsilon=1e-5, name="norm2")(query))
                return query + film(y, s2, sh2)
            # v3: post-norm with per-norm FiLM
            query = self._attn(query, query_pos, ref_points, spatial_shapes)
            query = film(nn.LayerNorm(epsilon=1e-5, name="norm1")(query), s1, sh1)
            query = query + Mlp(self.ffn_dim, self.embed_dims, act=nn.gelu,
                                name="ffn")(query)
            return film(nn.LayerNorm(epsilon=1e-5, name="norm2")(query), s2, sh2)

        # v1 (default)
        query = self._attn(query, query_pos, ref_points, spatial_shapes)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        query = query + Mlp(self.ffn_dim, self.embed_dims, act=nn.gelu, name="ffn")(query)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query)
        if timed:
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
    attn_type: str = "msda"
    window: int = 8
    film: str = "v1"
    # rematerialize each layer in the backward pass: the MSDA window-gather
    # keeps [B·H·P, 2, 2, D] temps that pad 4x on TPU — storing them for
    # all 6 layers at 512^2/b8 needs 82 GB HBM (measured OOM on v5e-16G);
    # remat recomputes them instead (standard jax.checkpoint trade)
    remat: bool = False

    @nn.compact
    def __call__(self, query, time, query_pos, ref_points, spatial_shapes):
        # static_argnums: spatial_shapes is a Python tuple of ints used for
        # reshapes (arg index 5 counting self) — must stay static under remat
        layer_cls = (nn.remat(TimeFiLMEncoderLayer, static_argnums=(5,))
                     if self.remat else TimeFiLMEncoderLayer)
        for i in range(self.num_layers):
            query = layer_cls(
                self.embed_dims, self.num_heads, self.num_levels, self.num_points,
                self.ffn_dim, self.use_time, self.attn_type, self.window,
                shift=0 if i % 2 == 0 else self.window // 2, film=self.film,
                name=f"layer{i}",
            )(query, time, query_pos, ref_points, spatial_shapes)
        return query


class WindowSelfAttention(nn.Module):
    """Dense shifted-window self-attention over the token grid — the
    TPU-first alternative to deformable sampling (pure MXU, no gather; see
    ops/pallas/msda_notes.md for the measurements motivating it). Swin-style
    partition/shift, no relative bias (position comes from the decoder's
    sine embedding)."""

    embed_dims: int = 256
    num_heads: int = 8
    window: int = 8
    shift: int = 0
    residual: bool = True

    @nn.compact
    def __call__(self, query: jnp.ndarray, query_pos: Optional[jnp.ndarray],
                 hw: Tuple[int, int]) -> jnp.ndarray:
        from .swin import _shift_attn_mask, window_partition, window_reverse

        b, s, c = query.shape
        h, w = hw
        identity = query
        if query_pos is not None:
            query = query + query_pos
        x = query.reshape(b, h, w, c)
        win = self.window
        pad_h = (-h) % win
        pad_w = (-w) % win
        hp, wp = h + pad_h, w + pad_w
        shift = self.shift if min(hp, wp) > win else 0
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(hp, wp, win, shift)
        mask = jnp.asarray(mask) if mask is not None else None

        xw = window_partition(x, win)  # [B*nW, win², C]
        nh, d = self.num_heads, c // self.num_heads
        qkv = nn.Dense(3 * c, name="qkv")(xw).reshape(xw.shape[0], -1, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d**-0.5), k)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, nh, attn.shape[-2], attn.shape[-1])
            attn = attn + mask[None, :, None]
            attn = attn.reshape(-1, nh, attn.shape[-2], attn.shape[-1])
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        y = y.reshape(xw.shape[0], -1, c)
        y = nn.Dense(c, name="proj")(y)
        y = window_reverse(y, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        y = y.reshape(b, s, c)
        return identity + y if self.residual else y
