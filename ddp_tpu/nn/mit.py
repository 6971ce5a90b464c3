"""Mix Vision Transformer (MiT, the SegFormer backbone), NHWC.

Parity target: mmseg's MixVisionTransformer
(segmentation/mmseg/models/backbones/mit.py) — shipped by the reference for
inheritance compat (SURVEY.md §2.3). 4-stage hierarchical transformer:
overlapping patch embeds (7/4, then 3/2), efficient self-attention with
spatial-reduction (sr_ratio) on K/V, Mix-FFN with a 3x3 depthwise conv, LN
per stage output.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import DropPath, trunc_normal_init


class EfficientAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        nh, d = self.num_heads, c // self.num_heads
        q = nn.Dense(c, name="q")(x).reshape(b, n, nh, d)
        kv_in = x
        if self.sr_ratio > 1:
            g = x.reshape(b, h, w, c)
            g = nn.Conv(c, (self.sr_ratio,) * 2, strides=(self.sr_ratio,) * 2,
                        padding="VALID", name="sr")(g)
            kv_in = g.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(kv_in)
        kv = nn.Dense(2 * c, name="kv")(kv_in).reshape(b, -1, 2, nh, d)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        y = nn.Dense(self.hidden, name="fc1")(x)
        g = y.reshape(b, h, w, self.hidden)
        g = nn.Conv(self.hidden, (3, 3), padding="SAME",
                    feature_group_count=self.hidden, name="dwconv")(g)
        y = nn.gelu(g.reshape(b, n, self.hidden))
        return nn.Dense(c, name="fc2")(y)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int],
                 train: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = EfficientAttention(self.dim, self.num_heads, self.sr_ratio,
                               name="attn")(y, hw)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MixFFN(self.dim, int(self.dim * self.mlp_ratio), name="ffn")(y, hw)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=not train)


class MixVisionTransformer(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)  # mit-b2
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    drop_path_rate: float = 0.1
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        b = x.shape[0]
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        outs = []
        blk_i = 0
        for stage, depth in enumerate(self.depths):
            patch, stride = (7, 4) if stage == 0 else (3, 2)
            x = nn.Conv(self.embed_dims[stage], (patch, patch),
                        strides=(stride, stride), padding="SAME",
                        name=f"patch_embed{stage}")(x)
            h, w = x.shape[1], x.shape[2]
            x = x.reshape(b, h * w, self.embed_dims[stage])
            x = nn.LayerNorm(epsilon=1e-6, name=f"embed_norm{stage}")(x)
            for blk in range(depth):
                x = MiTBlock(self.embed_dims[stage], self.num_heads[stage],
                             self.sr_ratios[stage], 4.0, float(dpr[blk_i]),
                             name=f"stage{stage}_block{blk}")(x, (h, w), train=train)
                blk_i += 1
            x = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{stage}")(x)
            x = x.reshape(b, h, w, self.embed_dims[stage])
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)


def mit_variant(name: str) -> dict:
    depths = {
        "nano": (1, 1, 1, 1), "b0": (2, 2, 2, 2), "b1": (2, 2, 2, 2),
        "b2": (3, 4, 6, 3), "b3": (3, 4, 18, 3), "b4": (3, 8, 27, 3),
        "b5": (3, 6, 40, 3),
    }
    dims = {
        "nano": (16, 32, 64, 128), "b0": (32, 64, 160, 256),
    }
    d = dict(depths=depths[name])
    d["embed_dims"] = dims.get(name, (64, 128, 320, 512))
    if name == "nano":
        d["num_heads"] = (1, 2, 4, 8)
    return d
