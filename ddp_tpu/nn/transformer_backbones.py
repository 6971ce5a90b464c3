"""Compat backbones III: Twins (PCPVT/SVT), BEiT/MAE-style ViT, EfficientNet.

TPU-native re-designs of the remaining mmseg/depth-toolbox backbones the
reference inherits (SURVEY.md §2.3: segmentation/mmseg/models/backbones/
{twins,beit,mae}.py; depth/depth/models/backbones/efficientnet.py). NHWC,
tuple-of-feature-maps contract. Attention is dense (MXU-friendly) — windows
and subsampling are static reshapes, no gathers."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import DropPath, Mlp, trunc_normal_init


def _attn(q, k, v, num_heads):
    """Dense multi-head attention over token dims. q,k,v: [B, N, C]."""
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    q = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, m, num_heads, d).transpose(0, 2, 1, 3)
    a = nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d), axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", a, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class GlobalSubsampledAttention(nn.Module):
    """Twins GSA: keys/values from an sr_ratio-strided conv subsample of the
    map (twins.py GlobalSubsampledAttention)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        q = nn.Dense(c, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            y = x.reshape(b, h, w, c)
            y = nn.Conv(c, (self.sr_ratio,) * 2, strides=(self.sr_ratio,) * 2,
                        name="sr")(y)
            y = nn.LayerNorm(epsilon=1e-6, name="sr_norm")(y)
            kv_in = y.reshape(b, -1, c)
        k = nn.Dense(c, name="k")(kv_in)
        v = nn.Dense(c, name="v")(kv_in)
        out = _attn(q, k, v, self.num_heads)
        return nn.Dense(c, name="proj")(out)


class LocallyGroupedAttention(nn.Module):
    """Twins-SVT LSA: full attention inside non-overlapping windows
    (twins.py LocallyGroupedSelfAttention). H, W must divide window_size
    after the patch embeds (holds for the standard 512-crop configs)."""

    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        ws = min(self.window_size, h, w)
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        y = x.reshape(b, h, w, c)
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hh, ww = h + pad_h, w + pad_w
        y = y.reshape(b, hh // ws, ws, ww // ws, ws, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        qkv = nn.Dense(3 * c, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if pad_h or pad_w:
            # mask padded key positions (the reference LSA adds a -1000 bias
            # to padded tokens, twins.py:118-125); the pad layout is static
            valid = np.zeros((hh, ww), np.float32)
            valid[:h, :w] = 1.0
            valid = valid.reshape(hh // ws, ws, ww // ws, ws)
            valid = valid.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
            mask = jnp.asarray((1.0 - valid) * -1000.0)  # [nW, ws*ws]
            mask = jnp.tile(mask, (b, 1))[:, None, None, :]  # [b*nW,1,1,ws2]
            bq, n_, _ = q.shape
            d = c // self.num_heads
            qh = q.reshape(bq, n_, self.num_heads, d).transpose(0, 2, 1, 3)
            kh = k.reshape(bq, n_, self.num_heads, d).transpose(0, 2, 1, 3)
            vh = v.reshape(bq, n_, self.num_heads, d).transpose(0, 2, 1, 3)
            a = jnp.einsum("bhnd,bhmd->bhnm", qh, kh) / np.sqrt(d) + mask
            a = nn.softmax(a, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", a, vh)
            out = out.transpose(0, 2, 1, 3).reshape(bq, n_, c)
        else:
            out = _attn(q, k, v, self.num_heads)
        out = nn.Dense(c, name="proj")(out)
        out = out.reshape(b, hh // ws, ww // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c)
        return out[:, :h, :w].reshape(b, n, c)


class _TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    attn: str  # 'gsa' | 'lsa'
    sr_ratio: int = 1
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        if self.attn == "gsa":
            a = GlobalSubsampledAttention(self.dim, self.num_heads,
                                          self.sr_ratio, name="attn")
        else:
            a = LocallyGroupedAttention(self.dim, self.num_heads,
                                        self.window_size, name="attn")
        y = a(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), hw)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=not train)
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x + DropPath(self.drop_path, name="dp2")(y,
                                                        deterministic=not train)


class Twins(nn.Module):
    """Twins-PCPVT / Twins-SVT backbone (mmseg twins.py). PCPVT uses GSA in
    every block; SVT alternates LSA/GSA. Conditional positional encoding
    (PEG: 3x3 depthwise conv) after the first block of each stage."""

    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    svt: bool = False  # True: alternate LSA/GSA (Twins-SVT)
    window_size: int = 7
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        outs = []
        for s, (dim, depth, heads, sr) in enumerate(zip(
                self.dims, self.depths, self.num_heads, self.sr_ratios)):
            ps = 4 if s == 0 else 2
            x = nn.Conv(dim, (ps, ps), strides=(ps, ps),
                        name=f"patch_embed{s}")(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"pe_norm{s}")(x)
            b, h, w, c = x.shape
            t = x.reshape(b, h * w, c)
            for i in range(depth):
                attn = ("lsa" if (self.svt and i % 2 == 0) else "gsa")
                t = _TwinsBlock(dim, heads, attn, sr_ratio=sr,
                                window_size=self.window_size,
                                drop_path=float(dpr[bi]),
                                name=f"s{s}_block{i}")(t, (h, w), train=train)
                bi += 1
                if i == 0:  # PEG conditional position encoding
                    y = t.reshape(b, h, w, c)
                    y = nn.Conv(c, (3, 3), padding="SAME",
                                feature_group_count=c, name=f"peg{s}")(y)
                    t = (y.reshape(b, h * w, c) + t)
            x = t.reshape(b, h, w, c)
            if self.svt:
                # SVT default norm_after_stage=True: the stage norm applies to
                # x itself, so the next stage's patch embed sees normed maps
                # (twins.py norm_after_stage / norm_list)
                x = nn.LayerNorm(epsilon=1e-6, name=f"out_norm{s}")(x)
                if s in self.out_indices:
                    outs.append(x)
            elif s in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6, name=f"out_norm{s}")(x))
        return tuple(outs)


class _BEiTBlock(nn.Module):
    """BEiT transformer block: shared relative-position bias + LayerScale
    (mmseg beit.py BEiTTransformerEncoderLayer)."""

    dim: int
    num_heads: int
    grid: Tuple[int, int]
    mlp_ratio: float = 4.0
    init_values: float = 0.1
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = self.grid
        # relative position bias table over the token grid
        num_rel = (2 * h - 1) * (2 * w - 1)
        table = self.param("rel_pos_table", trunc_normal_init(0.02),
                           (num_rel, self.num_heads))
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([ys.reshape(-1), xs.reshape(-1)])  # [2, N]
        rel = coords[:, :, None] - coords[:, None, :]
        idx = (rel[0] + h - 1) * (2 * w - 1) + (rel[1] + w - 1)
        bias = table[jnp.asarray(idx.reshape(-1))]
        bias = bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)

        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=True, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c // self.num_heads
        q = q.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.num_heads, d).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d) + bias[None]
        a = nn.softmax(a, axis=-1)
        y = jnp.einsum("bhnm,bhmd->bhnd", a, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        y = nn.Dense(c, name="proj")(y)
        g1 = self.param("gamma1", nn.initializers.constant(self.init_values),
                        (c,))
        x = x + DropPath(self.drop_path, name="dp1")(g1 * y,
                                                     deterministic=not train)
        y = Mlp(int(c * self.mlp_ratio), c, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        g2 = self.param("gamma2", nn.initializers.constant(self.init_values),
                        (c,))
        return x + DropPath(self.drop_path, name="dp2")(g2 * y,
                                                        deterministic=not train)


class BEiT(nn.Module):
    """BEiT/MAE-style ViT backbone (mmseg beit.py / mae.py): plain ViT with
    per-block relative-position bias and LayerScale, multi-level taps
    upsampled by the caller's neck (Feature2Pyramid). The [CLS] token of the
    pretrain checkpoints carries no spatial signal for dense prediction and
    is omitted (importer drops its bias entries)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    init_values: float = 0.1
    drop_path_rate: float = 0.0
    out_indices: Sequence[int] = (3, 5, 7, 11)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        outs = []
        for i in range(self.depth):
            t = _BEiTBlock(self.embed_dim, self.num_heads, (h, w),
                           init_values=self.init_values,
                           drop_path=float(dpr[i]),
                           name=f"block{i}")(t, train=train)
            if i in self.out_indices:
                outs.append(t.reshape(b, h, w, c))
        return tuple(outs)


# EfficientNet-B0 stage settings: (expand, kernel, stride, out, repeats)
_EFFNET_B0 = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


class EfficientNet(nn.Module):
    """EfficientNet backbone (depth/depth/models/backbones/efficientnet.py):
    MBConv (inverted residual + SE ratio 0.25 + swish) stages; width/depth
    multipliers give B0..B4. Taps at strides 4/8/16/32."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    out_stages: Sequence[int] = (1, 2, 4, 6)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def rnd_w(w):
            w = w * self.width_mult
            nw = max(8, int(w + 4) // 8 * 8)
            return int(nw + 8) if nw < 0.9 * w else int(nw)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-3, name=name)

        x = nn.silu(bn("stem_bn")(nn.Conv(rnd_w(32), (3, 3), strides=(2, 2),
                                          padding="SAME", use_bias=False,
                                          name="stem")(x)))
        outs = []
        for si, (e, k, s, o, r) in enumerate(_EFFNET_B0):
            o = rnd_w(o)
            r = int(np.ceil(r * self.depth_mult))
            for i in range(r):
                inp = x.shape[-1]
                stride = s if i == 0 else 1
                y = x
                exp = inp * e
                if e != 1:
                    y = nn.silu(bn(f"s{si}b{i}_exp_bn")(
                        nn.Conv(exp, (1, 1), use_bias=False,
                                name=f"s{si}b{i}_exp")(y)))
                y = nn.silu(bn(f"s{si}b{i}_dw_bn")(
                    nn.Conv(exp, (k, k), strides=(stride,) * 2,
                            padding="SAME", feature_group_count=exp,
                            use_bias=False, name=f"s{si}b{i}_dw")(y)))
                se = jnp.mean(y, axis=(1, 2), keepdims=True)
                se = nn.silu(nn.Conv(max(1, inp // 4), (1, 1),
                                     name=f"s{si}b{i}_se1")(se))
                se = nn.sigmoid(nn.Conv(exp, (1, 1),
                                        name=f"s{si}b{i}_se2")(se))
                y = y * se
                y = bn(f"s{si}b{i}_pw_bn")(
                    nn.Conv(o, (1, 1), use_bias=False,
                            name=f"s{si}b{i}_pw")(y))
                if stride == 1 and inp == o:
                    y = x + y
                x = y
            if si in self.out_stages:
                outs.append(x)
        return tuple(outs)
