"""Sparse 3-D convolution for the lidar branch — TPU gather-GEMM-scatter.

Parity target: the reference's spconv library + SparseEncoder
(bev/mmdet3d/ops/spconv/*, bev/mmdet3d/models/backbones/sparse_encoder.py) —
SubMConv3d / strided SparseConv3d stacks with BN1d(eps 1e-3) + ReLU, channels
((16,),(32,32,32),(64,64,64),(64,64,64)), stride-2 stage entries, and a final
(1,1,3)/(1,1,2) conv collapsing z before densification.

TPU-first split (SURVEY.md §2.4 'hardest piece'):
  - HOST (C++ ddp_tpu/native): hash-based rulebook construction with static
    capacities — per kernel offset k, gather[k, o] = the single input voxel
    feeding output o (or -1). Computed once per sample in the data pipeline.
  - DEVICE (here): one padded gather + one batched [K·V, Cin]x[Cin, Cout]
    matmul per layer — pure MXU work, no dynamic shapes, autodiff for free.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import BatchNorm


def sparse_conv_gather_gemm(
    feats: jnp.ndarray,  # [V_in, Cin]
    gather: jnp.ndarray,  # [K, V_out] int32, -1 = missing
    weight: jnp.ndarray,  # [K, Cin, Cout]
) -> jnp.ndarray:
    """out[o] = sum_k feats[gather[k, o]] @ weight[k] (missing -> 0)."""
    v_in = feats.shape[0]
    padded = jnp.concatenate([feats, jnp.zeros((1, feats.shape[1]), feats.dtype)])
    idx = jnp.where(gather < 0, v_in, gather)  # [K, V_out]
    g = padded[idx]  # [K, V_out, Cin]
    return jnp.einsum("kvc,kcd->vd", g, weight,
                      preferred_element_type=jnp.float32).astype(feats.dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over the ACTIVE rows of a padded [V, C] voxel tensor.

    The reference's spconv tensors hold only active voxels, so its
    nn.BatchNorm1d statistics span exactly the active set
    (sparse_encoder.py BN1d(eps 1e-3)). Our static-capacity padding would
    otherwise pour thousands of zero rows into the mean/var (r3 fusion run:
    ~200 active of 1024 rows → stats scaled ~5x off), which starved the
    lidar branch (r4 diagnosis: zero_lidar cost only 0.02 mIoU).
    Variable names match flax BatchNorm so checkpoints stay structural."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            w = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(w.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * w).sum(axis=0) / n
            var = (jnp.square(xf - mean) * w).sum(axis=0) / n
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + self.epsilon).astype(x.dtype)
        return y * scale + bias


class SparseConvLayer(nn.Module):
    """conv → BN1d(eps 1e-3, active rows only) → ReLU over active voxels."""

    out_channels: int
    num_offsets: int = 27
    use_act: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray, gather: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        cin = feats.shape[-1]
        w = self.param("kernel", nn.initializers.variance_scaling(
            1.0, "fan_in", "normal"), (self.num_offsets, cin, self.out_channels))
        y = sparse_conv_gather_gemm(feats, gather, w)
        # a row is an active output site iff any kernel offset feeds it
        # (subm rulebooks always contain the center offset for active sites)
        active = jnp.any(gather >= 0, axis=0)
        y = MaskedBatchNorm(name="bn")(y, active, train)
        if self.use_act:
            y = nn.relu(y)
        # keep padding rows at exactly zero (BN's bias would leak a constant
        # into them; they'd be masked at densification but pollute gathers
        # of strided levels whose rulebooks can reference any padded row)
        return y * active[:, None].astype(y.dtype)


class SparseEncoder(nn.Module):
    """The SECOND-style sparse voxel encoder. Rulebooks are batch inputs.

    ``rulebooks`` layout per sample (built host-side by
    :func:`build_sparse_encoder_rulebooks`):
      subm1, spconv2, subm2, spconv3, subm3, spconv4, subm4, down:
      gather arrays [K, cap_i]; plus out coordinate/valid info for
      densification: down_coords [capd, 3], down_valid [capd].
    """

    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Tuple[Tuple[int, ...], ...] = ((16,), (32, 32, 32),
                                                     (64, 64, 64), (64, 64, 64))
    dense_hw: int = 128
    dense_z: int = 2

    @nn.compact
    def __call__(self, voxel_feats: jnp.ndarray, rulebooks: Dict[str, jnp.ndarray],
                 train: bool = True) -> jnp.ndarray:
        """voxel_feats: [cap0, C] mean point features (zero-padded rows).
        Returns dense BEV features [dense_hw, dense_hw, dense_z * Cout]."""
        x = SparseConvLayer(self.base_channels, name="conv_input")(
            voxel_feats, rulebooks["subm1"], train)
        # stage 0: subm convs at full res
        for j, ch in enumerate(self.encoder_channels[0]):
            x = SparseConvLayer(ch, name=f"enc0_{j}")(x, rulebooks["subm1"], train)
        # stages 1..3: strided entry + subm body
        for si in range(1, 4):
            chans = self.encoder_channels[si]
            x = SparseConvLayer(chans[0], name=f"enc{si}_0")(
                x, rulebooks[f"spconv{si + 1}"], train)
            for j, ch in enumerate(chans[1:], start=1):
                x = SparseConvLayer(ch, name=f"enc{si}_{j}")(
                    x, rulebooks[f"subm{si + 1}"], train)
        # conv_out: kernel (1,1,3) stride (1,1,2) -> K = 3 offsets
        x = SparseConvLayer(self.output_channels, num_offsets=3,
                            name="conv_out")(x, rulebooks["down"], train)
        # densify: scatter rows to [H, W, Z, C], collapse z into channels
        coords = rulebooks["down_coords"]  # [capd, 3] (x, y, z)
        valid = rulebooks["down_valid"]  # [capd]
        hw, z = self.dense_hw, self.dense_z
        flat_idx = (coords[:, 0] * hw + coords[:, 1]) * z + coords[:, 2]
        flat_idx = jnp.where(valid, flat_idx, hw * hw * z)  # dump slot
        dense = jnp.zeros((hw * hw * z + 1, x.shape[-1]), x.dtype)
        dense = dense.at[flat_idx].add(jnp.where(valid[:, None], x, 0.0))
        dense = dense[:-1].reshape(hw, hw, z * x.shape[-1])
        return dense


def build_sparse_encoder_rulebooks(
    coords: np.ndarray, n_voxels: int, sparse_shape=(1024, 1024, 41),
    caps: Sequence[int] = (120_000, 60_000, 30_000, 15_000, 15_000),
) -> Dict[str, np.ndarray]:
    """Host-side: all rulebooks for one SparseEncoder pass.

    coords: [cap0, 3] int32 (x, y, z); rows >= n_voxels ignored.
    caps: static capacities per resolution level (full, /2, /4, /8, down).
    """
    from .. import native

    shape = np.asarray(sparse_shape, np.int64)
    out = {}
    cur_coords, cur_n = coords, n_voxels
    out["subm1"] = native.build_subm_rulebook(cur_coords, cur_n, caps[0])
    for si in range(1, 4):
        pad = (1, 1, 0) if si == 3 else 1
        oc, g, n_out = native.build_sparse_rulebook(
            cur_coords, cur_n, tuple(shape),
            kernel=(3, 3, 3) if si == 3 else 3,
            stride=(2, 2, 2) if si == 3 else 2,
            pad=pad, cap=caps[si])
        out[f"spconv{si + 1}"] = g
        out[f"subm{si + 1}"] = native.build_subm_rulebook(oc, n_out, caps[si])
        cur_coords, cur_n = oc, n_out
        if si == 3:
            shape = (shape + 2 * np.asarray((1, 1, 0)) - 3) // 2 + 1
        else:
            shape = (shape + 2 - 3) // 2 + 1
    # conv_out: kernel (1,1,3) stride (1,1,2) pad 0
    oc, g, n_out = native.build_sparse_rulebook(
        cur_coords, cur_n, tuple(shape), kernel=(1, 1, 3), stride=(1, 1, 2),
        pad=(0, 0, 0), cap=caps[4])
    out["down"] = g
    out["down_coords"] = oc
    valid = np.zeros(caps[4], bool)
    valid[:n_out] = True
    out["down_valid"] = valid
    return out


def mean_voxel_features(voxels: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Hard-voxelization mean reduce (bevfusion.py:135-163 'mean' mode)."""
    s = voxels.sum(axis=1)
    return (s / np.maximum(counts[:, None], 1)).astype(np.float32)
