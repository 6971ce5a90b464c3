"""Inherited depth decode heads beyond the DDP deformable head.

Parity targets (studied, not copied):
  - DenseDepthHead (depth/depth/models/decode_heads/densedepth_head.py:29-134):
    top-down UpSample fusion decoder (convA/convB after skip concat), or the
    FPN variant; sigmoid·max_depth output (decode_head.py:233-270 scale_up).
  - AdabinsHead (depth/depth/models/decode_heads/adabins_head.py): DenseDepth
    decoder + mViT over the finest feature → adaptive bin widths + range
    attention maps → softmax over bins, depth = Σ p_k · center_k.
  - BinsFormer-style CE auxiliary supported via the bins output.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule


class UpSampleFuse(nn.Module):
    """Upsample-to-skip, concat, convA→convB (Adabins/DenseDepth fusion)."""

    features: int
    norm: str = None
    act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        up = resize(x, skip.shape[1:3], mode="bilinear", align_corners=True)
        y = jnp.concatenate([up, skip], axis=-1)
        y = ConvModule(self.features, (3, 3), norm=self.norm, act=self.act,
                       name="convA")(y, train=train)
        return ConvModule(self.features, (3, 3), norm=self.norm, act=self.act,
                          name="convB")(y, train=train)


class DenseDepthHead(nn.Module):
    """Top-down fusion decoder over a 4-level pyramid → 1-channel depth."""

    up_sample_channels: Sequence[int] = (128, 256, 512, 1024)
    max_depth: float = 10.0
    min_depth: float = 1e-3
    scale_up: bool = True  # sigmoid*max_depth vs relu+min
    norm: str = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        chans = list(self.up_sample_channels)[::-1]
        x = None
        for i, feat in enumerate(reversed(list(feats))):
            if i == 0:
                x = ConvModule(chans[0], (1, 1), name="conv0")(feat, train=train)
            else:
                x = UpSampleFuse(chans[i], norm=self.norm,
                                 name=f"up{i}")(x, feat, train=train)
        d = nn.Conv(1, (3, 3), padding="SAME", name="conv_depth")(x)
        if self.scale_up:
            return nn.sigmoid(d) * self.max_depth
        return nn.relu(d) + self.min_depth


class PatchTransformerEncoder(nn.Module):
    """Patch-embed + 4-layer post-norm transformer (adabins mViT core)."""

    embedding_dim: int = 128
    patch_size: int = 16
    num_heads: int = 4
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        e = nn.Conv(self.embedding_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, padding="VALID",
                    name="embed")(x)
        s = e.shape[1] * e.shape[2]
        e = e.reshape(b, s, self.embedding_dim)
        pos = self.param("pos", nn.initializers.uniform(1.0),
                         (500, self.embedding_dim))
        e = e + pos[None, :s]
        for i in range(self.num_layers):
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, name=f"attn{i}")(e, e)
            e = nn.LayerNorm(name=f"norm1_{i}")(e + y)
            y = nn.Dense(1024, name=f"fc1_{i}")(e)
            y = nn.Dense(self.embedding_dim, name=f"fc2_{i}")(nn.relu(y))
            e = nn.LayerNorm(name=f"norm2_{i}")(e + y)
        return e  # [B, S, E]


class AdabinsHead(nn.Module):
    """Adaptive-bins depth head: DenseDepth decoder + mViT bins."""

    up_sample_channels: Sequence[int] = (128, 256, 512, 1024)
    n_bins: int = 256
    n_query_channels: int = 128
    embedding_dim: int = 128
    patch_size: int = 16
    max_depth: float = 10.0
    min_depth: float = 1e-3
    norm: str = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (depth [B,h,w,1], bin_edges [B, n_bins+1])."""
        chans = list(self.up_sample_channels)[::-1]
        x = None
        for i, feat in enumerate(reversed(list(feats))):
            if i == 0:
                x = ConvModule(chans[0], (1, 1), name="conv0")(feat, train=train)
            else:
                x = UpSampleFuse(chans[i], norm=self.norm,
                                 name=f"up{i}")(x, feat, train=train)
        # mViT: tokens[0] regresses bin widths; tokens[1:Q+1] are queries
        tgt = PatchTransformerEncoder(self.embedding_dim, self.patch_size,
                                      name="mvit")(x)
        head_tok = tgt[:, 0]
        queries = tgt[:, 1:self.n_query_channels + 1]  # [B, Q, E]
        keys = nn.Conv(self.embedding_dim, (3, 3), padding="SAME",
                       name="conv3x3")(x)  # [B, h, w, E]
        range_attn = jnp.einsum("bhwe,bqe->bhwq", keys, queries)
        y = nn.Dense(256, name="reg1")(head_tok)
        y = nn.Dense(256, name="reg2")(nn.leaky_relu(y))
        y = nn.Dense(self.n_bins, name="reg3")(nn.leaky_relu(y))
        widths = nn.relu(y) + 0.1  # 'linear' norm
        widths = widths / widths.sum(axis=1, keepdims=True)
        widths = widths * (self.max_depth - self.min_depth)
        edges = jnp.cumsum(
            jnp.concatenate([jnp.full((widths.shape[0], 1), self.min_depth,
                                      widths.dtype), widths], axis=1), axis=1)
        centers = 0.5 * (edges[:, :-1] + edges[:, 1:])  # [B, n_bins]
        logits = nn.Conv(self.n_bins, (1, 1), name="conv_out")(range_attn)
        probs = jax.nn.softmax(logits, axis=-1)
        depth = jnp.einsum("bhwk,bk->bhw", probs, centers)[..., None]
        return depth, edges


def local_planar_guidance(plane_eq: jnp.ndarray, ratio: int) -> jnp.ndarray:
    """BTS local planar guidance (bts_head.py:97-120): expand per-cell plane
    coefficients [B, h, w, 4] by ``ratio`` and evaluate the plane depth at
    each subpixel: depth = n4 / (n1·u + n2·v + n3). NHWC, static shapes."""
    b, h, w, _ = plane_eq.shape
    pe = jnp.repeat(jnp.repeat(plane_eq, ratio, axis=1), ratio, axis=2)
    n1, n2, n3, n4 = jnp.split(pe, 4, axis=-1)
    grid = (jnp.arange(ratio, dtype=pe.dtype) - (ratio - 1) * 0.5) / ratio
    u = jnp.tile(grid[None, :], (h, 1)).reshape(1, h * ratio, 1, 1)
    v = jnp.tile(grid[None, :], (w, 1)).reshape(1, 1, w * ratio, 1)
    return (n4 / (n1 * v + n2 * u + n3))[..., 0]


class _PlaneCoeffs(nn.Module):
    """reduction_1x1 (bts_head.py:53-95): conv stack → (theta, phi, dist) →
    unit plane normal + distance [B, h, w, 4]."""

    max_depth: float
    channels: int = 32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        while c >= 4:
            x = nn.relu(nn.Conv(c, (1, 1), name=f"reduc_{c}")(x))
            c = c // 2
        xyz = nn.Conv(3, (1, 1), name="plane_params")(x)
        theta = jax.nn.sigmoid(xyz[..., 0]) * (np.pi / 3)
        phi = jax.nn.sigmoid(xyz[..., 1]) * (np.pi * 2)
        dist = jax.nn.sigmoid(xyz[..., 2]) * self.max_depth
        return jnp.stack([jnp.sin(theta) * jnp.cos(phi),
                          jnp.sin(theta) * jnp.sin(phi),
                          jnp.cos(theta), dist], axis=-1)


class BTSHead(nn.Module):
    """BTS multi-scale local planar guidance head
    (depth/.../bts_head.py:123-297, compact): decoder with skip fusion;
    plane-coefficient branches at 1/8, 1/4, 1/2 produce LPG depth maps at
    the output scale; their concat with the final features predicts depth.

    Input: 4-level pyramid (finest first, strides 4/8/16/32 of the image);
    output depth at the finest level's resolution."""

    max_depth: float = 10.0
    channels: int = 64
    min_depth: float = 1e-3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        f4, f8, f16, f32 = feats
        x = nn.relu(nn.Conv(self.channels * 4, (3, 3), padding=1,
                            name="dense_32")(f32))
        lpg_depths = []
        for name, skip, ratio, ch in (("16", f16, 0, 4), ("8", f8, 8, 2),
                                      ("4", f4, 4, 1)):
            x = resize(x, skip.shape[1:3], mode="bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = nn.relu(nn.Conv(self.channels * ch, (3, 3), padding=1,
                                name=f"up_{name}")(x))
            if ratio:
                plane = _PlaneCoeffs(self.max_depth,
                                     name=f"plane_{name}")(x)
                lpg = local_planar_guidance(plane, ratio)
                lpg_depths.append(lpg[..., None] / self.max_depth)
        target = feats[0].shape[1:3]
        lpgs = [resize(d, target, mode="bilinear") for d in lpg_depths]
        x = jnp.concatenate([x] + lpgs, axis=-1)
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1, name="final")(x))
        depth = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                       name="depth_pred")(x)) * self.max_depth
        return jnp.maximum(depth, self.min_depth)


class _CRFBlock(nn.Module):
    """Neural window FC-CRF block (newcrfs.py:160-230, compact): windowed
    cross-attention where the QUERY comes from the image feature and the
    VALUE from the coarser prediction embedding, plus an MLP."""

    dim: int
    num_heads: int = 4
    window: int = 4

    @nn.compact
    def __call__(self, x, v):
        b, h, w, c = x.shape
        win = min(self.window, h, w)
        ph, pw = (-h) % win, (-w) % win
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hh, ww = h + ph, w + pw

        def part(t):
            t = t.reshape(b, hh // win, win, ww // win, win, t.shape[-1])
            return t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win,
                                                         t.shape[-1])

        q = nn.Dense(c, name="q")(part(xp))
        k = nn.Dense(c, name="k")(part(xp))
        val = nn.Dense(c, name="v")(part(vp))
        nh, d = self.num_heads, c // self.num_heads
        qh = q.reshape(-1, win * win, nh, d)
        kh = k.reshape(-1, win * win, nh, d)
        vh = val.reshape(-1, win * win, nh, d)
        a = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", qh, kh) / np.sqrt(d), axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", a, vh).reshape(-1, win * win, c)
        y = y.reshape(b, hh // win, ww // win, win, win, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)[:, :h, :w]
        x = x + y
        x = x + nn.Dense(c, name="mlp2")(
            nn.gelu(nn.Dense(c * 2, name="mlp1")(nn.LayerNorm(name="ln")(x))))
        return x


class NeWCRFHead(nn.Module):
    """NeWCRFs depth head (depth/.../newcrfs.py, compact): PPM on the
    coarsest level, then per-level neural-window-CRF refinement cascading
    coarse→fine, sigmoid depth at the finest level."""

    max_depth: float = 10.0
    channels: int = 64
    min_depth: float = 1e-3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # PPM over the coarsest map
        x = feats[-1]
        pooled = [resize(jnp.mean(x, axis=(1, 2), keepdims=True),
                         x.shape[1:3], mode="nearest")]
        ppm = jnp.concatenate([x] + pooled, axis=-1)
        v = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            name="ppm")(ppm))
        for i in reversed(range(len(feats) - 1)):
            skip = feats[i]
            v = resize(v, skip.shape[1:3], mode="bilinear")
            q = nn.relu(nn.Conv(self.channels, (1, 1),
                                name=f"proj_{i}")(skip))
            v = _CRFBlock(self.channels, name=f"crf_{i}")(q, v)
        depth = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=1,
                                       name="depth_pred")(v)) * self.max_depth
        return jnp.maximum(depth, self.min_depth)


class BinsFormerHead(nn.Module):
    """BinsFormer depth head (depth/.../binsformer_head.py, compact):
    learned bin queries cross-attend the pixel features through transformer
    decoder layers; queries → adaptive bin widths (softplus-normalized),
    pixel-feature · query-embedding logits → per-bin probabilities →
    depth = Σ centers · probs (the Adabins decoding, :20-30)."""

    max_depth: float = 10.0
    n_bins: int = 16
    channels: int = 64
    dec_layers: int = 2
    num_heads: int = 4
    min_depth: float = 1e-3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            name="pixel_proj")(feats[0]))
        b, h, w, c = x.shape
        mem = x.reshape(b, h * w, c)
        q = self.param("query_feat", nn.initializers.normal(0.02),
                       (self.n_bins, c))
        q = jnp.tile(q[None], (b, 1, 1))
        nh, d = self.num_heads, c // self.num_heads
        for li in range(self.dec_layers):
            qq = nn.Dense(c, name=f"l{li}_q")(nn.LayerNorm(name=f"l{li}_ln1")(q))
            kk = nn.Dense(c, name=f"l{li}_k")(mem)
            vv = nn.Dense(c, name=f"l{li}_v")(mem)
            a = jax.nn.softmax(jnp.einsum(
                "bnhd,bmhd->bhnm", qq.reshape(b, -1, nh, d),
                kk.reshape(b, -1, nh, d)) / np.sqrt(d), axis=-1)
            y = jnp.einsum("bhnm,bmhd->bnhd", a,
                           vv.reshape(b, -1, nh, d)).reshape(b, -1, c)
            q = q + nn.Dense(c, name=f"l{li}_proj")(y)
            q = q + nn.Dense(c, name=f"l{li}_mlp2")(
                nn.gelu(nn.Dense(c * 2, name=f"l{li}_mlp1")(
                    nn.LayerNorm(name=f"l{li}_ln2")(q))))
        widths = jax.nn.softplus(nn.Dense(1, name="bin_mlp")(q))[..., 0] + 0.1
        widths = widths / widths.sum(-1, keepdims=True)  # [B, n_bins]
        edges = jnp.cumsum(widths, axis=-1)
        centers = self.min_depth + (edges - widths / 2) * (
            self.max_depth - self.min_depth)
        emb = nn.Dense(c, name="query_emb")(q)  # [B, n_bins, C]
        logits = jnp.einsum("bsc,bnc->bsn", mem, emb).reshape(
            b, h, w, self.n_bins)
        probs = jax.nn.softmax(logits, axis=-1)
        depth = jnp.einsum("bhwn,bn->bhw", probs, centers)[..., None]
        return jnp.maximum(depth, self.min_depth)
