"""Neck zoo beyond FPN/MultiStageMerging (those live in nn/fpn.py).

Parity targets (studied, not copied):
  - PSPNeck (depth/depth/models/necks/psp.py:59-121): PPM pyramid pooling on
    the last level, appended as an extra level.
  - MultiLevelNeck (segmentation/mmseg/models/necks/multilevel_neck.py:6-78):
    per-level 1x1 lateral + scale resize + 3x3 conv — the ViT neck.
  - Feature2Pyramid (segmentation/mmseg/models/necks/featurepyramid.py:8-67):
    deconv/maxpool rescaling of a single-scale ViT feature.
  - SkipNeck (depth/depth/models/necks/skip_neck.py:10-54): pure resize.
  - HAHIHeteroNeck (depth/depth/models/necks/hahi.py:16-279, DepthFormer):
    deformable self-attention across transformer levels (HI) + deformable
    cross-attention from the conv-stem level into them (HA).

TPU notes: all resizes are static-shape; HAHI reuses this package's
multi-level deformable attention (ops/deform_attn.py), so it shares the same
TPU execution path as the denoising decoder.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule, trunc_normal_init
from .pos_embed import sine_pos_embed
from .transformer import DeformableAttention, reference_points


class PPM(nn.Module):
    """Pyramid Pooling Module: adaptive-avg-pool to ``pool_scales`` grids,
    1x1 conv, upsample back."""

    channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "BN"
    align_corners: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        b, h, w, c = x.shape
        outs = []
        for scale in self.pool_scales:
            # adaptive avg pool to (scale, scale): mean over equal bins
            # (static shapes; h, w divisible or not — use resize-based pooling)
            pooled = jnp.mean(
                x[:, : (h // scale) * scale, : (w // scale) * scale].reshape(
                    b, scale, h // scale, scale, w // scale, c),
                axis=(2, 4),
            )
            norm = "GN" if scale == 1 else self.norm  # psp.py:33
            y = ConvModule(self.channels, (1, 1), norm=norm, act="relu",
                           name=f"pool{scale}")(pooled, train=train)
            outs.append(resize(y, (h, w), mode="bilinear",
                               align_corners=self.align_corners))
        return outs


class PSPNeck(nn.Module):
    """PPM on the last level; the fused map is APPENDED as an extra level
    (psp.py:106-121)."""

    channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "BN"
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        x = inputs[-1]
        psp_outs = [x] + PPM(self.channels, self.pool_scales, self.norm,
                             self.align_corners, name="ppm")(x, train=train)
        fused = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                           name="bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), train=train)
        return tuple(list(inputs) + [fused])


class MultiLevelNeck(nn.Module):
    out_channels: int
    scales: Sequence[float] = (0.5, 1.0, 2.0, 4.0)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            ConvModule(self.out_channels, (1, 1), name=f"lateral{i}")(x, train=train)
            for i, x in enumerate(inputs)
        ]
        if len(laterals) == 1:
            laterals = [laterals[0]] * len(self.scales)
        outs = []
        for i, s in enumerate(self.scales):
            x = laterals[i]
            if s != 1.0:
                h, w = int(x.shape[1] * s), int(x.shape[2] * s)
                x = resize(x, (h, w), mode="bilinear")
            outs.append(ConvModule(self.out_channels, (3, 3),
                                   name=f"conv{i}")(x, train=train))
        return tuple(outs)


class Feature2Pyramid(nn.Module):
    """Rescale a single-stride ViT feature into a pyramid via deconv/maxpool."""

    embed_dim: int
    rescales: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    norm: str = "SyncBN"

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        from .common import make_norm

        outs = []
        for i, (k, x) in enumerate(zip(self.rescales, inputs)):
            if k == 4:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f"up4_a{i}")(x)
                x = make_norm(self.norm, train)(x)
                x = nn.gelu(x)
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f"up4_b{i}")(x)
            elif k == 2:
                x = nn.ConvTranspose(self.embed_dim, (2, 2), strides=(2, 2),
                                     name=f"up2_{i}")(x)
            elif k == 1:
                pass
            elif k == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif k == 0.25:
                x = nn.max_pool(x, (4, 4), strides=(4, 4))
            else:
                raise KeyError(f"invalid rescale {k}")
            outs.append(x)
        return tuple(outs)


class SkipNeck(nn.Module):
    """Pure per-level bilinear rescale (DPT reassemble hack)."""

    scales: Sequence[float] = (0.5, 1.0, 2.0, 4.0)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for x, s in zip(inputs, self.scales):
            if s != 1.0:
                h, w = int(x.shape[1] * s), int(x.shape[2] * s)
                x = resize(x, (h, w), mode="bilinear", align_corners=True)
            outs.append(x)
        return tuple(outs)


class HAHINeck(nn.Module):
    """Heterogeneous (conv-stem + transformer levels) interaction neck.

    inputs[0] is the conv-stem level; inputs[1:] are the transformer levels.
    HI: multi-level deformable SELF-attention over the flattened+concatenated
    projected transformer levels with level embeddings + sine pos.
    HA: deformable CROSS-attention — conv-level queries sample the fused
    transformer source at learned (Linear→sigmoid) reference points.
    """

    out_channels: Sequence[int]
    embedding_dim: int = 256
    num_points: int = 8
    num_heads: int = 8
    norm: str = "BN"
    self_att: bool = True
    cross_att: bool = True

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        laterals = [
            ConvModule(oc, (1, 1), norm=self.norm, act="relu",
                       name=f"lateral{i}")(x, train=train)
            for i, (x, oc) in enumerate(zip(inputs, self.out_channels))
        ]
        feat_conv = laterals[0]
        feats_trans = laterals[1:]
        L = len(feats_trans)
        b = feat_conv.shape[0]

        # --- HI: flatten + concat transformer levels ---
        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in feats_trans)
        level_embed = self.param("level_embed", trunc_normal_init(0.02),
                                 (L, self.embedding_dim))
        srcs, poss = [], []
        for i, f in enumerate(feats_trans):
            h, w = f.shape[1], f.shape[2]
            p = ConvModule(self.embedding_dim, (1, 1), norm=self.norm,
                           act="relu", name=f"trans_proj{i}")(f, train=train)
            srcs.append(p.reshape(b, h * w, self.embedding_dim))
            pos = jnp.asarray(
                sine_pos_embed(h, w, num_feats=self.embedding_dim // 2),
                dtype=f.dtype)
            poss.append(pos + level_embed[i][None, :])
        src = jnp.concatenate(srcs, axis=1)  # [B, S, E]
        pos = jnp.concatenate(poss, axis=0)  # [S, E]
        refs = jnp.asarray(reference_points(spatial_shapes), dtype=src.dtype)
        if self.self_att:
            src = DeformableAttention(
                self.embedding_dim, self.num_heads, L, self.num_points,
                name="self_attn")(src, src, pos, refs, spatial_shapes)

        # --- HA: conv level cross-attends into the fused source ---
        h0, w0 = feat_conv.shape[1], feat_conv.shape[2]
        q_feat = ConvModule(self.embedding_dim, (1, 1), norm=self.norm,
                            act="relu", name="conv_proj")(feat_conv, train=train)
        query = q_feat.reshape(b, h0 * w0, self.embedding_dim)
        q_pos = jnp.asarray(
            sine_pos_embed(h0, w0, num_feats=self.embedding_dim // 2),
            dtype=query.dtype)
        # learned reference points from the query pos embedding (hahi.py:110)
        ref_q = nn.sigmoid(nn.Dense(2, name="reference_points")(q_pos))
        ref_q = jnp.broadcast_to(ref_q[None, :, None, :], (b, h0 * w0, L, 2))
        if self.cross_att:
            attended = DeformableAttention(
                self.embedding_dim, self.num_heads, L, self.num_points,
                name="cross_attn")(query, src, q_pos, ref_q, spatial_shapes)
        else:
            attended = query
        attended = attended.reshape(b, h0, w0, self.embedding_dim)
        out_conv = ConvModule(self.out_channels[0], (3, 3), norm=self.norm,
                              act="relu", name="conv_fusion")(
            jnp.concatenate([attended, feat_conv], axis=-1), train=train)

        # --- unflatten src and fuse back per level ---
        outs = [out_conv]
        start = 0
        for i, f in enumerate(feats_trans):
            h, w = f.shape[1], f.shape[2]
            piece = src[:, start:start + h * w].reshape(b, h, w, self.embedding_dim)
            start += h * w
            fused = ConvModule(self.out_channels[i + 1], (3, 3), norm=self.norm,
                               act="relu", name=f"trans_fusion{i}")(
                jnp.concatenate([f, piece], axis=-1), train=train)
            outs.append(fused)
        return tuple(outs)


class JPU(nn.Module):
    """Joint Pyramid Upsampling neck (FastFCN; mmseg necks/jpu.py:12-135):
    per-level 3x3 conv → upsample all to the finest → concat → parallel
    depthwise-separable convs at dilations (1,2,4,8) → concat.

    Returns the untouched lower levels + the fused finest map, matching the
    reference's (inputs[:-3..], concat_feat) output contract reduced to the
    fused map appended after the start_level passthroughs."""

    mid_channels: int = 512
    dilations: Sequence[int] = (1, 2, 4, 8)
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        from .compat_heads import DepthwiseSeparableConv

        feats = []
        for i in range(self.start_level, len(inputs)):
            f = ConvModule(self.mid_channels, (3, 3), norm="BN", act="relu",
                           name=f"conv{i}")(inputs[i], train=train)
            feats.append(f)
        target = feats[0].shape[1:3]
        feats = [feats[0]] + [resize(f, target, mode="bilinear")
                              for f in feats[1:]]
        feat = jnp.concatenate(feats, axis=-1)
        outs = [DepthwiseSeparableConv(self.mid_channels, dilation=d,
                                       name=f"dil{d}")(feat, train=train)
                for d in self.dilations]
        fused = jnp.concatenate(outs, axis=-1)
        return tuple(inputs[:self.start_level]) + (fused,)
