"""Swin Transformer backbone (T/S/B/L), NHWC, TPU-idiomatic.

Parity target: mmseg's SwinTransformer as configured by the DDP configs
(configs/ade/ddp_swin_t_2x8_512x512_160k_ade20k.py:18-38 — patch 4, window 7,
depths/heads per variant, MLP ratio 4, qkv bias, patch norm, no absolute pos
embed, drop_path 0.3, LN out-norms on all four stages). Weight layout chosen so
released torch checkpoints can be imported with simple transposes
(see ddp_tpu/train/torch_import.py).

Window partitioning is pure reshape/transpose; the shifted-window attention
mask is precomputed statically per (H, W, window, shift) so the whole backbone
traces to static-shape XLA with no data-dependent control flow.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import DropPath, Mlp, trunc_normal_init


@functools.lru_cache(maxsize=128)
def _relative_position_index(window: int) -> np.ndarray:
    """[win², win²] indices into the (2w-1)² relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    coords = coords.reshape(2, -1)  # [2, win²]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, win², win²]
    rel = rel.transpose(1, 2, 0)  # [win², win², 2]
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=128)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> Optional[np.ndarray]:
    """Attention mask for shifted windows: [num_windows, win², win²] with 0 for
    allowed pairs and -100 for pairs from different pre-shift regions."""
    if shift == 0:
        return None
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    m = img_mask.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] != m[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, win², C] (H, W divisible by window)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of window_partition."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        # x: [B*nW, win², C]; mask: [nW, win², win²] or None
        bnw, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [bnw, n, h, d]
        q = q * (d ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k)

        table = self.param(
            "relative_position_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = jnp.asarray(_relative_position_index(self.window).reshape(-1))
        bias = table[idx].reshape(n, n, h)
        attn = attn + jnp.transpose(bias, (2, 0, 1))[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        win = self.window
        pad_h = (-h) % win
        pad_w = (-w) % win
        hp, wp = h + pad_h, w + pad_w
        shift = self.shift if min(hp, wp) > win else 0

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(hp, wp, win, shift)
        mask = jnp.asarray(mask) if mask is not None else None
        y = window_partition(y, win)
        y = WindowAttention(self.dim, self.num_heads, win, name="attn")(y, mask)
        y = window_reverse(y, win, hp, wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            y = y[:, :h, :w]
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic=not train)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, act=nn.gelu, name="ffn")(y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=not train)
        return x


class PatchMerging(nn.Module):
    """2x2 space-to-depth → LN → Linear(4C→2C) downsample."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            h, w = h + pad_h, w + pad_w
        # torch unfold(kernel=2, stride=2) orders channels as
        # [C*(ky*2+kx)] i.e. (x00, x01, x10, x11) each a full C block
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin backbone. Returns features from ``out_indices`` stages, NHWC."""

    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    patch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        p = self.patch_size
        pad_h = (-x.shape[1]) % p
        pad_w = (-x.shape[2]) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        outs = []
        block_idx = 0
        for stage, depth in enumerate(self.depths):
            dim = self.embed_dims * (2 ** stage)
            for blk in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[stage], self.window,
                    shift=0 if blk % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    name=f"stage{stage}_block{blk}",
                )(x, train=train)
                block_idx += 1
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim * 2, name=f"downsample{stage}")(x)
        return tuple(outs)


def swin_variant(name: str) -> dict:
    """Constructor kwargs for the published Swin variants used by DDP configs."""
    variants = {
        # 'nano' is a test-only scale (not in the reference) for fast CPU CI
        "nano": dict(embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2),
                     window=4),
        "tiny": dict(embed_dims=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
        "small": dict(embed_dims=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
        "base": dict(embed_dims=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
        "large": dict(embed_dims=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                      window=12),
    }
    return dict(variants[name])
