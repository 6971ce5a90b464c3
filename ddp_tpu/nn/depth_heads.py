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
