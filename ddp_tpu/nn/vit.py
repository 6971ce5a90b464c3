"""Vision Transformer backbone, NHWC grid outputs.

Parity target: mmseg's ViT (segmentation/mmseg/models/backbones/vit.py) as
shipped by the reference for inheritance compat (SURVEY.md §2.3) and the
depth toolbox's vit.py. Standard ViT-B/16-style encoder: patch embed,
learnable pos embed with bilinear resize to the input grid, pre-norm blocks,
``out_indices`` feature taps reshaped back to [B, H/p, W/p, C], optional
final LN per tap.

TPU notes: static-shape pos-embed interpolation happens at trace time;
attention is one fused einsum pair (XLA maps it onto the MXU).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import DropPath, Mlp, trunc_normal_init


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name="qkv")(y)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d**-0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        y = nn.Dense(c, name="proj")(y)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, name="mlp")(y, deterministic=not train)
        return x + DropPath(self.drop_path, name="dp2")(y, deterministic=not train)


class VisionTransformer(nn.Module):
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (2, 5, 8, 11)
    with_cls_token: bool = True
    final_norm: bool = False
    pretrain_grid: int = 14  # pos-embed grid of the pretrain resolution (224/16)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        b, H, W, _ = x.shape
        gh, gw = H // self.patch_size, W // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, padding="VALID",
                    name="patch_embed")(x)
        x = x.reshape(b, gh * gw, self.embed_dim)

        n_extra = 1 if self.with_cls_token else 0
        pos = self.param("pos_embed", trunc_normal_init(0.02),
                         (1, self.pretrain_grid**2 + n_extra, self.embed_dim))
        # bilinear-resize the grid part of the pos embed to (gh, gw)
        grid_pos = pos[:, n_extra:].reshape(
            1, self.pretrain_grid, self.pretrain_grid, self.embed_dim)
        grid_pos = jax.image.resize(grid_pos, (1, gh, gw, self.embed_dim),
                                    method="bilinear")
        grid_pos = grid_pos.reshape(1, gh * gw, self.embed_dim)
        if self.with_cls_token:
            cls = self.param("cls_token", trunc_normal_init(0.02),
                             (1, 1, self.embed_dim))
            x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
            x = x + jnp.concatenate([pos[:, :1], grid_pos], axis=1)
        else:
            x = x + grid_pos

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        outs = []
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         float(dpr[i]), name=f"layers_{i}")(x, train=train)
            if i in self.out_indices:
                y = x[:, n_extra:]
                if self.final_norm:
                    y = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{i}")(y)
                outs.append(y.reshape(b, gh, gw, self.embed_dim))
        return tuple(outs)


def vit_variant(name: str) -> dict:
    variants = {
        "nano": dict(embed_dim=32, depth=2, num_heads=2, out_indices=(0, 1)),
        "base": dict(embed_dim=768, depth=12, num_heads=12,
                     out_indices=(2, 5, 8, 11)),
        "large": dict(embed_dim=1024, depth=24, num_heads=16,
                      out_indices=(5, 11, 17, 23)),
    }
    return dict(variants[name])
