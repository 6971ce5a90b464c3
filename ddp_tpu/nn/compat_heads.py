"""Compat decode-head zoo — the inherited mmseg heads the reference ships.

The reference keeps ~30 upstream decode heads for compatibility alongside its
DDP-specific heads (SURVEY.md §2.3; segmentation/mmseg/models/decode_heads/).
This module provides TPU-native flax re-designs of the widely-used ones so a
user of the reference can switch task heads without leaving this framework:

  UPerHead        (uper_head.py)        — PSP + FPN fuse (Swin/ConvNeXt default)
  PSPHead         (psp_head.py)         — pyramid pooling
  ASPPHead        (aspp_head.py)        — DeepLabV3 atrous pyramid
  DepthwiseSeparableASPPHead (sep_aspp_head.py) — DeepLabV3+ w/ low-level skip
  SegformerHead   (segformer_head.py)   — all-MLP fuse
  OCRHead         (ocr_head.py)         — object-contextual representations
  DAHead          (da_head.py)          — dual (position+channel) attention
  NLHead          (nl_head.py)          — non-local block head
  LRASPPHead      (lraspp_head.py)      — MobileNetV3 lite R-ASPP
  FPNHead         (fpn_head.py)         — PanopticFPN-style scale heads
  SETRUPHead / SETRMLAHead (setr_up_head.py / setr_mla_head.py)
  DPTHead         (dpt_head.py; depth/.../dpt_head.py) — ViT reassemble+fusion

All heads take a *list* of NHWC feature maps (mirroring the reference's
``in_index`` selection happening in the caller), run in f32/bf16 under jit
with static shapes, and return logits at the resolution of their working
level (the task frontend resizes to label resolution, as the reference's
BaseDecodeHead.losses does via mmseg resize).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule


def _adaptive_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """[out, in] averaging matrix with torch adaptive_avg_pool2d bin edges
    (bin i spans [floor(i*n/s), ceil((i+1)*n/s))). Static, einsum-able."""
    import numpy as np

    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(m)


def _adaptive_avg_pool(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Adaptive average pool NHWC → (scale, scale), exact torch semantics
    (valid for any input size, including size < scale)."""
    h, w = x.shape[1:3]
    mh = _adaptive_pool_matrix(h, scale).astype(x.dtype)
    mw = _adaptive_pool_matrix(w, scale).astype(x.dtype)
    x = jnp.einsum("ph,bhwc->bpwc", mh, x)
    return jnp.einsum("qw,bpwc->bpqc", mw, x)


class _PPM(nn.Module):
    """mmseg-style pyramid pooling (all branches use the same norm,
    psp_head.py:PPM)."""

    channels: int
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "BN"
    align_corners: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        h, w = x.shape[1:3]
        outs = []
        for scale in self.pool_scales:
            y = _adaptive_avg_pool(x, scale)
            y = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                           name=f"pool{scale}")(y, train=train)
            outs.append(resize(y, (h, w), mode="bilinear",
                               align_corners=self.align_corners))
        return outs


class SegHeadOut(nn.Module):
    """dropout → 1x1 conv_seg — the shared classifier tail of every mmseg
    BaseDecodeHead (decode_head.py cls_seg)."""

    num_classes: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(x)


class PSPHead(nn.Module):
    """PSPNet head (mmseg psp_head.py:PSPHead): PPM on the last input level,
    concat, 3x3 bottleneck, classifier."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "BN"
    dropout: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = feats[-1]
        psp = _PPM(self.channels, self.pool_scales, self.norm,
                   self.align_corners, name="psp")(x, train=train)
        y = jnp.concatenate([x] + psp, axis=-1)
        y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="bottleneck")(y, train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class UPerHead(nn.Module):
    """UPerNet head (mmseg uper_head.py:UPerHead): PSP on the top level,
    FPN top-down over 1x1 laterals, upsample-concat all levels, fuse."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    norm: str = "BN"
    dropout: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        n = len(feats)
        # PSP branch on the deepest level
        psp = _PPM(self.channels, self.pool_scales, self.norm,
                   self.align_corners, name="psp")(feats[-1], train=train)
        top = jnp.concatenate([feats[-1]] + psp, axis=-1)
        top = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                         name="psp_bottleneck")(top, train=train)
        laterals = [
            ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                       name=f"lateral{i}")(feats[i], train=train)
            for i in range(n - 1)
        ] + [top]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize(
                laterals[i], laterals[i - 1].shape[1:3], mode="bilinear",
                align_corners=self.align_corners)
        outs = [
            ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name=f"fpn_conv{i}")(laterals[i], train=train)
            for i in range(n - 1)
        ] + [laterals[-1]]
        size = outs[0].shape[1:3]
        outs = [outs[0]] + [
            resize(o, size, mode="bilinear", align_corners=self.align_corners)
            for o in outs[1:]
        ]
        y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="fpn_bottleneck")(
            jnp.concatenate(outs, axis=-1), train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class _ASPP(nn.Module):
    """Atrous pyramid: 1x1 + dilated 3x3 branches + global image pool
    (aspp_head.py:ASPPModule + image_pool)."""

    channels: int
    dilations: Sequence[int] = (1, 12, 24, 36)
    norm: str = "BN"
    separable: bool = False
    align_corners: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        h, w = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                            name="image_pool")(pooled, train=train)
        outs = [resize(pooled, (h, w), mode="bilinear",
                       align_corners=self.align_corners)]
        for i, d in enumerate(self.dilations):
            if d == 1:
                y = ConvModule(self.channels, (1, 1), norm=self.norm,
                               act="relu", name=f"aspp{i}")(x, train=train)
            elif self.separable:
                y = DepthwiseSeparableConv(self.channels, (3, 3), dilation=d,
                                           norm=self.norm,
                                           name=f"aspp{i}")(x, train=train)
            else:
                y = nn.Conv(self.channels, (3, 3),
                            kernel_dilation=(d, d), padding="SAME",
                            use_bias=False, name=f"aspp{i}_conv")(x)
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"aspp{i}_bn")(y)
                y = nn.relu(y)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class DepthwiseSeparableConv(nn.Module):
    """depthwise 3x3 (+BN+ReLU) → pointwise 1x1 (+BN+ReLU) — mmcv
    DepthwiseSeparableConvModule."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: int = 1
    norm: Optional[str] = "BN"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        x = nn.Conv(c, self.kernel_size, strides=self.strides,
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=c, padding="SAME", use_bias=False,
                    name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="pw_bn")(x)
        return nn.relu(x)


class ASPPHead(nn.Module):
    """DeepLabV3 head (mmseg aspp_head.py:ASPPHead)."""

    num_classes: int
    channels: int = 512
    dilations: Sequence[int] = (1, 12, 24, 36)
    norm: str = "BN"
    dropout: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        y = _ASPP(self.channels, self.dilations, self.norm,
                  align_corners=self.align_corners, name="aspp")(
            feats[-1], train=train)
        y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="bottleneck")(y, train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class DepthwiseSeparableASPPHead(nn.Module):
    """DeepLabV3+ head (mmseg sep_aspp_head.py): separable ASPP on the top
    level + 48-ch low-level (c1) skip, two separable 3x3 fuse convs."""

    num_classes: int
    channels: int = 512
    c1_channels: int = 48
    dilations: Sequence[int] = (1, 12, 24, 36)
    norm: str = "BN"
    dropout: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        y = _ASPP(self.channels, self.dilations, self.norm, separable=True,
                  align_corners=self.align_corners, name="aspp")(
            feats[-1], train=train)
        y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="bottleneck")(y, train=train)
        c1 = ConvModule(self.c1_channels, (1, 1), norm=self.norm, act="relu",
                        name="c1_bottleneck")(feats[0], train=train)
        y = resize(y, c1.shape[1:3], mode="bilinear",
                   align_corners=self.align_corners)
        y = jnp.concatenate([y, c1], axis=-1)
        y = DepthwiseSeparableConv(self.channels, norm=self.norm,
                                   name="sep1")(y, train=train)
        y = DepthwiseSeparableConv(self.channels, norm=self.norm,
                                   name="sep2")(y, train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class SegformerHead(nn.Module):
    """SegFormer all-MLP head (mmseg segformer_head.py): per-level 1x1 →
    upsample to the finest level → concat → 1x1 fuse."""

    num_classes: int
    channels: int = 256
    norm: str = "BN"
    dropout: float = 0.1
    align_corners: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        size = feats[0].shape[1:3]
        outs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.channels, (1, 1), name=f"proj{i}")(f)
            outs.append(resize(y, size, mode="bilinear",
                               align_corners=self.align_corners))
        y = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                       name="fuse")(jnp.concatenate(outs, axis=-1),
                                    train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class OCRHead(nn.Module):
    """Object-Contextual Representations head (mmseg ocr_head.py:OCRHead).

    Cascade head: takes features and the previous head's logits; soft object
    regions gather per-class context vectors, and pixel→object attention
    redistributes them.
    """

    num_classes: int
    channels: int = 512
    ocr_channels: int = 256
    norm: str = "BN"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 prev_logits: jnp.ndarray, train: bool = False):
        x = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="bottleneck")(feats[-1], train=train)
        b, h, w, c = x.shape
        k = prev_logits.shape[-1]
        # spatial gather: per-class soft region context [B, K, C]
        probs = nn.softmax(prev_logits.reshape(b, -1, k), axis=1)
        ctx = jnp.einsum("bsk,bsc->bkc", probs, x.reshape(b, -1, c))
        # object attention (embedded-gaussian, scale-normed)
        d = self.ocr_channels
        q = nn.Dense(d, use_bias=False, name="query")(x.reshape(b, -1, c))
        key = nn.Dense(d, use_bias=False, name="key")(ctx)
        val = nn.Dense(d, use_bias=False, name="value")(ctx)
        attn = nn.softmax(
            jnp.einsum("bsd,bkd->bsk", q, key) / jnp.sqrt(float(d)), axis=-1)
        y = jnp.einsum("bsk,bkd->bsd", attn, val)
        y = nn.Dense(self.channels, use_bias=False, name="up_proj")(y)
        y = y.reshape(b, h, w, self.channels)
        y = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                       name="fuse")(jnp.concatenate([y, x], axis=-1),
                                    train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class DAHead(nn.Module):
    """Dual-attention head (mmseg da_head.py: PAM + CAM, DANet). Returns the
    fused logits; the reference supervises pam/cam branches separately —
    exposed via ``return_aux``."""

    num_classes: int
    channels: int = 512
    norm: str = "BN"
    dropout: float = 0.1
    return_aux: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = feats[-1]
        b, h, w, _ = x.shape
        ch = self.channels

        pam_in = ConvModule(ch, (3, 3), norm=self.norm, act="relu",
                            name="pam_in")(x, train=train)
        # position attention: q,k reduced to ch//8
        q = nn.Conv(ch // 8, (1, 1), name="pam_q")(pam_in).reshape(b, -1, ch // 8)
        kk = nn.Conv(ch // 8, (1, 1), name="pam_k")(pam_in).reshape(b, -1, ch // 8)
        v = nn.Conv(ch, (1, 1), name="pam_v")(pam_in).reshape(b, -1, ch)
        attn = nn.softmax(jnp.einsum("bqd,bkd->bqk", q, kk), axis=-1)
        pam = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, ch)
        gamma_p = self.param("pam_gamma", nn.initializers.zeros, ())
        pam = pam_in + gamma_p * pam
        pam = ConvModule(ch, (3, 3), norm=self.norm, act="relu",
                         name="pam_out")(pam, train=train)

        cam_in = ConvModule(ch, (3, 3), norm=self.norm, act="relu",
                            name="cam_in")(x, train=train)
        f = cam_in.reshape(b, -1, ch)
        energy = jnp.einsum("bsc,bsd->bcd", f, f)  # [B, C, C]
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn_c = nn.softmax(energy, axis=-1)
        cam = jnp.einsum("bcd,bsd->bsc", attn_c, f).reshape(b, h, w, ch)
        gamma_c = self.param("cam_gamma", nn.initializers.zeros, ())
        cam = cam_in + gamma_c * cam
        cam = ConvModule(ch, (3, 3), norm=self.norm, act="relu",
                         name="cam_out")(cam, train=train)

        fused = pam + cam
        out = SegHeadOut(self.num_classes, self.dropout, name="out")(
            fused, train=train)
        if self.return_aux:
            pam_o = SegHeadOut(self.num_classes, self.dropout, name="pam_cls")(
                pam, train=train)
            cam_o = SegHeadOut(self.num_classes, self.dropout, name="cam_cls")(
                cam, train=train)
            return out, pam_o, cam_o
        return out


class NLHead(nn.Module):
    """Non-local head (mmseg nl_head.py): embedded-gaussian NonLocal2d on the
    bottlenecked top level, concat-fused."""

    num_classes: int
    channels: int = 512
    reduction: int = 2
    norm: str = "BN"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="bottleneck")(feats[-1], train=train)
        b, h, w, c = x.shape
        d = max(c // self.reduction, 1)
        theta = nn.Conv(d, (1, 1), name="theta")(x).reshape(b, -1, d)
        phi = nn.Conv(d, (1, 1), name="phi")(x).reshape(b, -1, d)
        g = nn.Conv(d, (1, 1), name="g")(x).reshape(b, -1, d)
        attn = nn.softmax(jnp.einsum("bqd,bkd->bqk", theta, phi), axis=-1)
        y = jnp.einsum("bqk,bkd->bqd", attn, g).reshape(b, h, w, d)
        y = nn.Conv(c, (1, 1), name="conv_out",
                    kernel_init=nn.initializers.zeros)(y)
        y = x + y
        y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                       name="fuse")(jnp.concatenate([feats[-1], y], axis=-1),
                                    train=train)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            y, train=train)


class LRASPPHead(nn.Module):
    """Lite R-ASPP (mmseg lraspp_head.py, MobileNetV3 search head): a
    sigmoid-gated globally-pooled branch over the deepest level plus 1x1
    skips from the shallower levels. Global average pooling stands in for
    the reference's large strided AvgPool (49x49/16) — identical at typical
    1/16-scale feature sizes and static-shape friendly."""

    num_classes: int
    channels: int = 128
    norm: str = "BN"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = feats[-1]
        y = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                       name="aspp_conv")(x, train=train)
        gate = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = nn.sigmoid(nn.Conv(self.channels, (1, 1), name="image_pool")(gate))
        y = y * gate
        for i in range(len(feats) - 2, -1, -1):
            y = resize(y, feats[i].shape[1:3], mode="bilinear",
                       align_corners=False)
            skip = nn.Conv(self.channels, (1, 1), name=f"skip{i}")(feats[i])
            y = ConvModule(self.channels, (1, 1), norm=self.norm, act="relu",
                           name=f"fuse{i}")(y + skip, train=train)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(y)


class FPNHead(nn.Module):
    """Panoptic-FPN style head (mmseg fpn_head.py): per-level scale heads
    (3x3 conv + 2x upsample repeated), summed at 1/4 scale."""

    num_classes: int
    channels: int = 128
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    norm: str = "BN"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        size = feats[0].shape[1:3]
        out = None
        for i, (f, s) in enumerate(zip(feats, self.feature_strides)):
            reps = max(1, (s // self.feature_strides[0]).bit_length() - 1)
            y = f
            for r in range(reps):
                y = ConvModule(self.channels, (3, 3), norm=self.norm,
                               act="relu", name=f"scale{i}_conv{r}")(
                    y, train=train)
                if s > self.feature_strides[0]:
                    y = resize(y, (y.shape[1] * 2, y.shape[2] * 2),
                               mode="bilinear", align_corners=False)
            if y.shape[1:3] != tuple(size):
                y = resize(y, size, mode="bilinear", align_corners=False)
            out = y if out is None else out + y
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            out, train=train)


class SETRUPHead(nn.Module):
    """SETR naive/progressive upsampling head (mmseg setr_up_head.py):
    LN on tokens-as-map, then (conv → bilinear 2x) x num_convs."""

    num_classes: int
    channels: int = 256
    num_convs: int = 1
    up_scale: int = 4
    norm: str = "BN"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        x = feats[-1]
        x = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        for i in range(self.num_convs):
            x = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                           name=f"up_conv{i}")(x, train=train)
            x = resize(x, (x.shape[1] * self.up_scale,
                           x.shape[2] * self.up_scale),
                       mode="bilinear", align_corners=False)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            x, train=train)


class SETRMLAHead(nn.Module):
    """SETR multi-level aggregation head (mmseg setr_mla_head.py): per-level
    conv-conv-4x-up, channel concat, classifier."""

    num_classes: int
    channels: int = 128
    up_scale: int = 4
    norm: str = "BN"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for i, f in enumerate(feats):
            y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                           name=f"mla{i}_conv1")(f, train=train)
            y = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                           name=f"mla{i}_conv2")(y, train=train)
            y = resize(y, (y.shape[1] * self.up_scale,
                           y.shape[2] * self.up_scale),
                       mode="bilinear", align_corners=False)
            outs.append(y)
        return SegHeadOut(self.num_classes, self.dropout, name="out")(
            jnp.concatenate(outs, axis=-1), train=train)


class _ResidualConvUnit(nn.Module):
    """DPT residual conv unit: relu→conv→relu→conv + skip."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(y)
        return x + y


class DPTHead(nn.Module):
    """DPT head (depth/.../dpt_head.py; Ranftl et al.): reassemble 4 ViT-level
    maps to a pyramid, top-down FeatureFusion with residual conv units, then
    either a depth regressor (sigmoid-free, relu+eps) or a seg classifier.

    Inputs are 4 NHWC maps at the SAME resolution (ViT) or a pyramid
    (hierarchical backbones) — each is projected then resampled ×(4,2,1,0.5)
    relative to its input, mirroring the reference's reassemble stage.
    """

    out_channels: int  # num_classes for seg, 1 for depth
    channels: int = 256
    post_channels: Sequence[int] = (96, 192, 384, 768)
    mode: str = "depth"  # 'depth' | 'seg'
    min_depth: float = 1e-3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        assert len(feats) == len(self.post_channels)
        scales = (4.0, 2.0, 1.0, 0.5)
        pyr = []
        for i, (f, pc) in enumerate(zip(feats, self.post_channels)):
            y = nn.Conv(pc, (1, 1), name=f"reassemble{i}")(f)
            h, w = y.shape[1:3]
            s = scales[i]
            nh, nw = max(int(h * s), 1), max(int(w * s), 1)
            if (nh, nw) != (h, w):
                y = resize(y, (nh, nw), mode="bilinear", align_corners=True)
            y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                        name=f"project{i}")(y)
            pyr.append(y)
        # top-down fusion
        x = _ResidualConvUnit(self.channels, name="rcu_top")(pyr[-1])
        for i in range(len(pyr) - 2, -1, -1):
            x = resize(x, pyr[i].shape[1:3], mode="bilinear",
                       align_corners=True)
            skip = _ResidualConvUnit(self.channels, name=f"rcu_skip{i}")(pyr[i])
            x = _ResidualConvUnit(self.channels, name=f"rcu_fuse{i}")(x + skip)
        x = nn.Conv(self.channels // 2, (3, 3), padding="SAME",
                    name="head_conv1")(x)
        x = resize(x, (x.shape[1] * 2, x.shape[2] * 2), mode="bilinear",
                   align_corners=True)
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(x))
        out = nn.Conv(self.out_channels, (1, 1), name="head_out")(x)
        if self.mode == "depth":
            return nn.relu(out) + self.min_depth
        return out


def point_uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """PointRend uncertainty: −(top1 − top2) of the class logits
    (mmseg point_head.py calculate_uncertainty)."""
    top2 = jax.lax.top_k(logits, 2)[0]
    return top2[..., 1] - top2[..., 0]


class PointHead(nn.Module):
    """PointRend refinement head (mmseg point_head.py:40-349), TPU-static.

    Cascade head: upsample the previous head's coarse logits to the fine
    feature grid, pick the K most-uncertain pixels (STATIC K — the dynamic
    subdivision loop becomes one fixed-size top-k pass), refine each with a
    shared MLP over [fine feature ; coarse logits] (the reference's conv1d
    stack with coarse_pred_each_layer=True), and scatter the refined logits
    back into the grid.
    """

    num_classes: int
    fc_channels: int = 256
    num_fcs: int = 3
    point_fraction: float = 1.0 / 16.0  # K = fraction of the fine grid

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 prev_logits: jnp.ndarray, train: bool = False):
        fine = feats[0]  # finest level
        b, h, w, c = fine.shape
        coarse = resize(prev_logits, (h, w), mode="bilinear")
        k = max(1, int(h * w * self.point_fraction))

        unc = point_uncertainty(coarse).reshape(b, h * w)
        _, idx = jax.lax.top_k(unc, k)  # [B, K] flat indices

        fine_flat = fine.reshape(b, h * w, c)
        coarse_flat = coarse.reshape(b, h * w, self.num_classes)
        take = lambda x: jnp.take_along_axis(
            x, idx[..., None].repeat(x.shape[-1], -1), axis=1)
        x = take(fine_flat)  # [B, K, C]
        cpts = take(coarse_flat)  # [B, K, K_cls]
        for i in range(self.num_fcs):
            x = jnp.concatenate([x, cpts], axis=-1)
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
        refined = nn.Dense(self.num_classes, name="fc_seg")(x)  # [B, K, Kc]

        out = coarse_flat
        bidx = jnp.arange(b)[:, None]
        out = out.at[bidx, idx].set(refined)
        return out.reshape(b, h, w, self.num_classes)
