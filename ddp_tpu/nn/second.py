"""SECOND / PointPillars lidar-branch components, TPU-first.

Parity targets (bev/mmdet3d/models/):
  - backbones/second.py:14-90 — SECOND: per-stage [strided 3x3 conv + N
    convs], BN eps 1e-3, ReLU, multi-scale outputs.
  - necks/second.py:14-100 — SECONDFPN: per-level deconv (or strided conv
    for fractional strides) to a common resolution, concat.
  - backbones/pillar_encoder.py:23-255 — PillarFeatureNet (point decoration
    with cluster/center offsets, PFN Linear+BN+ReLU+max layers) and
    PointPillarsScatter (pillar features → dense BEV canvas).

TPU-first design: pillar capacity is STATIC (padded with masks, like
ops/bev_pool.py); the scatter is one segment_sum over flattened cell ids
with a dump slot for invalid pillars — no dynamic shapes, fwd+bwd defined.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SECOND(nn.Module):
    """Multi-stage 2D conv backbone over BEV features."""

    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, name=name)

        outs = []
        for i, (ch, n, s) in enumerate(zip(self.out_channels, self.layer_nums,
                                           self.layer_strides)):
            x = nn.Conv(ch, (3, 3), strides=(s, s), padding=1, use_bias=False,
                        name=f"s{i}_conv0")(x)
            x = nn.relu(bn(f"s{i}_bn0")(x))
            for j in range(n):
                x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                            name=f"s{i}_conv{j + 1}")(x)
                x = nn.relu(bn(f"s{i}_bn{j + 1}")(x))
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Deconv-upsample each SECOND stage to a common grid and concat."""

    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> jnp.ndarray:
        assert len(feats) == len(self.out_channels)
        outs = []
        for i, (x, ch, s) in enumerate(zip(feats, self.out_channels,
                                           self.upsample_strides)):
            if s > 1:
                si = int(s)
                x = nn.ConvTranspose(ch, (si, si), strides=(si, si),
                                     use_bias=False, name=f"deconv{i}")(x)
            else:
                si = int(round(1.0 / s)) if s < 1 else 1
                x = nn.Conv(ch, (si, si), strides=(si, si), use_bias=False,
                            name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"bn{i}")(x)
            outs.append(nn.relu(x))
        return jnp.concatenate(outs, axis=-1)


class PillarFeatureNet(nn.Module):
    """Decorate pillar points with cluster/center offsets, then PFN layers
    (Linear→BN→ReLU→max over points; non-final layers concat the max back).

    Inputs (static pillar capacity P, points-per-pillar N):
      feats:  [B, P, N, D] raw point features (xyz + extras), zero-padded
      counts: [B, P] real points per pillar (0 = empty)
      coords: [B, P, 2] int (ix, iy) pillar grid coords
    Returns [B, P, C] pillar features.
    """

    feat_channels: Sequence[int] = (64,)
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (0.0, -40.0)  # x_min, y_min
    with_distance: bool = False

    @nn.compact
    def __call__(self, feats, counts, coords, train: bool = False):
        b, p, n, d = feats.shape
        cnt = jnp.maximum(counts, 1).astype(feats.dtype)[..., None, None]
        mean = feats[..., :3].sum(axis=2, keepdims=True) / cnt
        f_cluster = feats[..., :3] - mean
        vx, vy = self.voxel_size
        cx = coords[..., 0:1].astype(feats.dtype) * vx + (vx / 2 + self.pc_range[0])
        cy = coords[..., 1:2].astype(feats.dtype) * vy + (vy / 2 + self.pc_range[1])
        f_center = jnp.stack([feats[..., 0] - cx, feats[..., 1] - cy], axis=-1)
        parts = [feats, f_cluster, f_center]
        if self.with_distance:
            parts.append(jnp.linalg.norm(feats[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(parts, axis=-1)
        # zero padded points (decorations leak nonzero values into padding)
        mask = (jnp.arange(n)[None, None, :] < counts[..., None])
        x = x * mask[..., None].astype(x.dtype)

        chans = list(self.feat_channels)
        for i, ch in enumerate(chans):
            last = i == len(chans) - 1
            units = ch if last else ch // 2
            x = nn.Dense(units, use_bias=False, name=f"pfn{i}_linear")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f"pfn{i}_bn")(x)
            x = nn.relu(x)
            xmax = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=2)
            xmax = jnp.where(jnp.isfinite(xmax), xmax, 0.0)
            if last:
                return xmax
            x = jnp.concatenate(
                [x, jnp.broadcast_to(xmax[:, :, None, :], x.shape[:3] + (units,))],
                axis=-1)
        return xmax


def point_pillars_scatter(pillar_feats: jnp.ndarray, coords: jnp.ndarray,
                          valid: jnp.ndarray, nx: int, ny: int) -> jnp.ndarray:
    """Scatter pillar features to the dense BEV canvas [B, ny, nx, C]
    (pillar_encoder.py:207-253), static-capacity segment_sum with a dump
    slot (each pillar id is unique, so sum == write)."""
    cell = coords[..., 1] * nx + coords[..., 0]  # iy * nx + ix
    n_cells = nx * ny
    cell = jnp.where(valid, cell, n_cells)

    def one(f, c):
        out = jax.ops.segment_sum(f, c, num_segments=n_cells + 1)
        return out[:n_cells]

    canvas = jax.vmap(one)(pillar_feats, cell)
    return canvas.reshape(pillar_feats.shape[0], ny, nx,
                          pillar_feats.shape[-1])
