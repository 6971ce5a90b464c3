"""BEV pooling: scatter-sum camera frustum features into the BEV grid.

Parity target: the reference's CUDA ``bev_pool`` op (bev/mmdet3d/ops/bev_pool/
— QuickCumsum interval trick) as called from ``BaseTransform.bev_pool``
(bev/mmdet3d/models/vtransforms/base.py:128-163): quantize geometry to voxel
indices, drop out-of-range points, scatter-add features per (batch, z, x, y)
cell, collapse Z into channels.

TPU-first design: the reference filters dynamically (boolean indexing) then
runs a custom interval-cumsum kernel. Here the point count is STATIC
(N' = B·N·D·fH·fW); out-of-range points are masked by routing them to a dump
segment, and the scatter is one ``jax.ops.segment_sum`` — which XLA lowers to
an efficient sorted scatter on TPU, fwd and bwd (gather) both defined. No
dynamic shapes anywhere.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_geometry(
    geom: jnp.ndarray,  # [..., 3] points in lidar/ego frame
    bx: Tuple[float, float, float],
    dx: Tuple[float, float, float],
    nx: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxelize continuous coords: idx = floor((p - (bx - dx/2)) / dx).

    Returns (int coords [..., 3], in-range mask [...]).
    """
    bx = jnp.asarray(bx, geom.dtype)
    dx = jnp.asarray(dx, geom.dtype)
    nxa = jnp.asarray(nx, jnp.int32)
    idx = jnp.floor((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)
    ok = jnp.all((idx >= 0) & (idx < nxa), axis=-1)
    return idx, ok


def bev_pool(
    feats: jnp.ndarray,  # [B, P, C] per-batch flattened frustum features
    coords: jnp.ndarray,  # [B, P, 3] int voxel coords (x, y, z)
    valid: jnp.ndarray,  # [B, P] bool
    nx: int,
    ny: int,
    nz: int,
) -> jnp.ndarray:
    """Scatter-add into the BEV grid. Returns [B, nx, ny, nz*C] (Z collapsed
    into channels like the reference's ``cat(unbind(dim=Z))``)."""
    b, p, c = feats.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    cell = (z * nx + x) * ny + y  # within-batch segment id
    n_cells = nz * nx * ny
    cell = jnp.where(valid, cell, n_cells)  # dump slot per batch

    def one(feats_b, cell_b):
        out = jax.ops.segment_sum(feats_b, cell_b, num_segments=n_cells + 1)
        return out[:n_cells]

    pooled = jax.vmap(one)(feats, cell)  # [B, nz*nx*ny, C]
    pooled = pooled.reshape(b, nz, nx, ny, c)
    # collapse Z into channels: [B, nx, ny, nz*C]
    pooled = jnp.moveaxis(pooled, 1, 3).reshape(b, nx, ny, nz * c)
    return pooled
