"""Compat backbones II: the real-time segmentation family (NHWC, flax).

TPU-native re-designs of the mmseg-inherited lightweight backbones the
reference ships (SURVEY.md §2.3: segmentation/mmseg/models/backbones/
{stdc,bisenetv1,bisenetv2,fast_scnn,cgnet,erfnet,icnet}.py). Every model
returns a tuple of NHWC feature maps (backbone contract, see convnext.py).
These are dense conv stacks — XLA fuses them end-to-end; no custom kernels
needed."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule
from .mobile_hrnet import _InvertedResidual


def _cbr(x, w, k, s, name, train, act="relu", groups=1, dilation=1):
    """conv-BN-act with explicit names (shared shorthand for this module)."""
    x = nn.Conv(w, (k, k), strides=(s, s), padding="SAME",
                feature_group_count=groups,
                kernel_dilation=(dilation, dilation),
                use_bias=False, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, name=f"{name}_bn")(x)
    if act == "relu":
        x = nn.relu(x)
    return x


class STDCModule(nn.Module):
    """Short-Term-Dense-Concatenate block (stdc.py STDCModule): channel-
    halving conv chain whose taps are concatenated; stride-2 variant
    avg-pools the first tap."""

    features: int
    stride: int = 1
    num_convs: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        outs = []
        y = _cbr(x, self.features // 2, 1, 1, "c0", train)
        for i in range(1, self.num_convs):
            last = i == self.num_convs - 1
            w = self.features // (2 ** (i + 1)) if not last else \
                self.features // (2 ** i)
            s = self.stride if i == 1 else 1
            if i == 1 and self.stride == 2:
                outs.append(nn.avg_pool(y, (3, 3), strides=(2, 2),
                                        padding="SAME"))
            else:
                outs.append(y)
            y = _cbr(y, w, 3, s, f"c{i}", train)
        outs.append(y)
        return jnp.concatenate(outs, axis=-1)


class STDCNet(nn.Module):
    """STDC1/2 backbone (stdc.py STDCNet): stem convs then STDC stages at
    strides 8/16/32. ``blocks`` = (4,5,3) for STDC2, (2,2,2) for STDC1."""

    base: int = 64
    blocks: Sequence[int] = (2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = _cbr(x, self.base // 2, 3, 2, "stem0", train)
        x = _cbr(x, self.base, 3, 2, "stem1", train)
        outs = []
        w = self.base
        for s, n in enumerate(self.blocks):
            w = min(self.base * (2 ** (s + 2)), self.base * 16)
            for i in range(n):
                x = STDCModule(w, stride=2 if i == 0 else 1,
                               name=f"stage{s}_m{i}")(x, train=train)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)


class _ARM(nn.Module):
    """BiSeNetV1 attention-refinement module."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = _cbr(x, self.features, 3, 1, "conv", train)
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = _cbr(a, self.features, 1, 1, "att", train, act=None)
        return x * nn.sigmoid(a)


class _FFM(nn.Module):
    """BiSeNetV1 feature-fusion module (concat → conv → SE-style gate)."""

    features: int

    @nn.compact
    def __call__(self, sp: jnp.ndarray, cx: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = _cbr(jnp.concatenate([sp, cx], axis=-1), self.features, 1, 1,
                 "fuse", train)
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.relu(nn.Conv(self.features, (1, 1), name="att1")(a))
        a = nn.sigmoid(nn.Conv(self.features, (1, 1), name="att2")(a))
        return x + x * a


class BiSeNetV1(nn.Module):
    """BiSeNetV1 (bisenetv1.py): spatial path (3 stride-2 convs) + context
    path over a provided backbone's 1/16 and 1/32 taps with ARM + global
    context, fused by FFM. The context backbone is built in (a small STDC
    stack) so the module is self-contained like mmseg's default."""

    channels: int = 128
    spatial_channels: Sequence[int] = (64, 64, 64, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # spatial path: 1/8 resolution, rich detail
        sp = x
        for i, w in enumerate(self.spatial_channels[:3]):
            sp = _cbr(sp, w, 7 if i == 0 else 3, 2, f"sp{i}", train)
        sp = _cbr(sp, self.spatial_channels[3], 1, 1, "sp3", train)
        # context path: reuse STDC stages at 1/8, 1/16, 1/32
        c8, c16, c32 = STDCNet(base=64, name="context")(x, train=train)
        gap = jnp.mean(c32, axis=(1, 2), keepdims=True)
        gap = _cbr(gap, self.channels, 1, 1, "gap", train)
        a32 = _ARM(self.channels, name="arm32")(c32, train=train)
        a32 = a32 + gap
        a32 = resize(a32, c16.shape[1:3], mode="nearest")
        a32 = _cbr(a32, self.channels, 3, 1, "refine32", train)
        a16 = _ARM(self.channels, name="arm16")(c16, train=train) + a32
        a16 = resize(a16, sp.shape[1:3], mode="nearest")
        a16 = _cbr(a16, self.channels, 3, 1, "refine16", train)
        fused = _FFM(self.channels * 2, name="ffm")(sp, a16, train=train)
        return (fused, a16, a32)


class _GatherExpansion(nn.Module):
    """BiSeNetV2 gather-and-expansion block (dwconv-heavy residual)."""

    features: int
    stride: int = 1
    expand: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        e = inp * self.expand
        y = _cbr(x, inp, 3, 1, "conv1", train)
        y = _cbr(y, e, 3, self.stride, "dw1", train, act=None, groups=inp)
        if self.stride == 2:
            y = _cbr(y, e, 3, 1, "dw2", train, act=None, groups=e)
            x = _cbr(x, inp, 3, 2, "short_dw", train, act=None, groups=inp)
            x = _cbr(x, self.features, 1, 1, "short_pw", train, act=None)
        y = _cbr(y, self.features, 1, 1, "pw", train, act=None)
        if x.shape == y.shape:
            y = x + y
        return nn.relu(y)


class BiSeNetV2(nn.Module):
    """BiSeNetV2 (bisenetv2.py): detail branch (3 conv stages) + semantic
    branch (stem + GE blocks + context embedding) + bilateral guided
    aggregation. Returns (aggregated, semantic taps...) for aux heads."""

    detail_channels: Sequence[int] = (64, 64, 128)
    semantic_channels: Sequence[int] = (16, 32, 64, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # detail branch → 1/8
        d = x
        for i, w in enumerate(self.detail_channels):
            d = _cbr(d, w, 3, 2, f"detail{i}_down", train)
            d = _cbr(d, w, 3, 1, f"detail{i}_conv", train)
        # semantic branch stem → 1/4
        s = _cbr(x, self.semantic_channels[0], 3, 2, "stem", train)
        left = _cbr(s, self.semantic_channels[0] // 2, 1, 1, "stem_l1", train)
        left = _cbr(left, self.semantic_channels[0], 3, 2, "stem_l2", train)
        right = nn.max_pool(s, (3, 3), strides=(2, 2), padding="SAME")
        s = _cbr(jnp.concatenate([left, right], axis=-1),
                 self.semantic_channels[0], 3, 1, "stem_fuse", train)
        taps = [s]
        for i, w in enumerate(self.semantic_channels[1:], start=1):
            s = _GatherExpansion(w, stride=2, name=f"ge{i}_down")(s, train=train)
            s = _GatherExpansion(w, stride=1, name=f"ge{i}_conv")(s, train=train)
            taps.append(s)
        # context embedding
        gap = jnp.mean(s, axis=(1, 2), keepdims=True)
        gap = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="ce_bn")(gap)
        gap = _cbr(gap, s.shape[-1], 1, 1, "ce_conv", train)
        s = _cbr(s + gap, s.shape[-1], 3, 1, "ce_fuse", train)
        # bilateral guided aggregation at 1/8
        dg = _cbr(d, d.shape[-1], 3, 1, "bga_d_dw", train, act=None,
                  groups=d.shape[-1])
        dg = nn.Conv(d.shape[-1], (1, 1), name="bga_d_pw")(dg)
        sg = _cbr(s, d.shape[-1], 3, 1, "bga_s", train, act=None)
        sg = resize(sg, d.shape[1:3], mode="bilinear", align_corners=False)
        out = dg * nn.sigmoid(sg)
        s_up = resize(_cbr(s, d.shape[-1], 3, 1, "bga_s2", train, act=None),
                      d.shape[1:3], mode="bilinear", align_corners=False)
        d_dn = _cbr(d, d.shape[-1], 3, 2, "bga_d2", train, act=None)
        d_dn = nn.avg_pool(d_dn, (3, 3), strides=(2, 2), padding="SAME")
        out2 = d_dn * nn.sigmoid(_cbr(s, d.shape[-1], 3, 1, "bga_s3", train,
                                      act=None))
        out2 = resize(out2, d.shape[1:3], mode="bilinear", align_corners=False)
        agg = _cbr(out + out2, d.shape[-1], 3, 1, "bga_out", train)
        return tuple([agg] + taps)


class FastSCNN(nn.Module):
    """Fast-SCNN (fast_scnn.py): learning-to-downsample (ds-convs) → global
    feature extractor (inverted residuals + PPM-lite) → feature fusion.
    Returns (fused, higher_res, lower_res)."""

    channels: Sequence[int] = (32, 48, 64)
    global_channels: Sequence[int] = (64, 96, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        # learning to downsample → 1/8
        x = _cbr(x, self.channels[0], 3, 2, "ld0", train)
        x = _cbr(x, self.channels[0], 3, 2, "ld1_dw", train,
                 groups=self.channels[0])
        x = _cbr(x, self.channels[1], 1, 1, "ld1_pw", train)
        x = _cbr(x, self.channels[1], 3, 2, "ld2_dw", train,
                 groups=self.channels[1])
        higher = _cbr(x, self.channels[2], 1, 1, "ld2_pw", train)
        # global feature extractor → 1/32
        y = higher
        for i, w in enumerate(self.global_channels):
            for b in range(3):
                y = _InvertedResidual(
                    w, y.shape[-1] * 6, stride=2 if (b == 0 and i < 2) else 1,
                    name=f"gfe{i}_{b}")(y, train=train)
        # PPM-lite: global pool context added back
        gap = jnp.mean(y, axis=(1, 2), keepdims=True)
        y = _cbr(y + gap, self.global_channels[-1], 3, 1, "ppm", train)
        lower = y
        # feature fusion at 1/8
        up = resize(lower, higher.shape[1:3], mode="bilinear",
                    align_corners=False)
        up = _cbr(up, up.shape[-1], 3, 1, "ffm_dw", train, act=None,
                  groups=up.shape[-1], dilation=1)
        up = _cbr(up, self.channels[2] * 2, 1, 1, "ffm_up", train, act=None)
        hi = _cbr(higher, self.channels[2] * 2, 1, 1, "ffm_hi", train,
                  act=None)
        fused = nn.relu(up + hi)
        return (fused, higher, lower)


class _CGBlock(nn.Module):
    """CGNet context-guided block: local 3x3 + surrounding dilated 3x3
    depthwise, joint BN+PReLU, global-context SE (cgnet.py)."""

    features: int
    dilation: int = 2
    stride: int = 1
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        y = _cbr(x, half, 3 if self.stride == 2 else 1, self.stride,
                 "reduce", train)
        loc = nn.Conv(half, (3, 3), padding="SAME", feature_group_count=half,
                      use_bias=False, name="f_loc")(y)
        sur = nn.Conv(half, (3, 3), padding="SAME",
                      kernel_dilation=(self.dilation,) * 2,
                      feature_group_count=half, use_bias=False,
                      name="f_sur")(y)
        j = jnp.concatenate([loc, sur], axis=-1)
        j = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(j)
        alpha = self.param("prelu", nn.initializers.constant(0.25),
                           (j.shape[-1],))
        j = jnp.where(j >= 0, j, alpha * j)
        # global context gate
        g = jnp.mean(j, axis=(1, 2))
        g = nn.relu(nn.Dense(self.features // self.reduction, name="fc1")(g))
        g = nn.sigmoid(nn.Dense(self.features, name="fc2")(g))
        j = j * g[:, None, None, :]
        if self.stride == 1 and x.shape[-1] == self.features:
            j = x + j
        return j


class CGNet(nn.Module):
    """CGNet backbone (cgnet.py): stem + 2 CG stages with input injection.
    Returns (stem_out, stage1, stage2)."""

    channels: Sequence[int] = (32, 64, 128)
    blocks: Sequence[int] = (3, 6)
    dilations: Sequence[int] = (2, 4)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        img = x
        y = x
        for i in range(3):
            y = _cbr(y, self.channels[0], 3, 2 if i == 0 else 1,
                     f"stem{i}", train)
        inj1 = resize(img, y.shape[1:3], mode="bilinear", align_corners=False)
        outs = [jnp.concatenate([y, inj1], axis=-1)]
        y = outs[0]
        for s in range(2):
            w, n, d = self.channels[s + 1], self.blocks[s], self.dilations[s]
            y = _CGBlock(w, dilation=d, stride=2, name=f"s{s}_down")(
                y, train=train)
            for i in range(n):
                y = _CGBlock(w, dilation=d, name=f"s{s}_b{i}")(y, train=train)
            if s == 0:
                inj = resize(img, y.shape[1:3], mode="bilinear",
                             align_corners=False)
                y = jnp.concatenate([y, inj], axis=-1)
            outs.append(y)
        return tuple(outs)


class _NonBottleneck1D(nn.Module):
    """ERFNet factorized residual block (3x1 + 1x3 pairs, 2nd dilated)."""

    features: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w, d = self.features, self.dilation
        y = nn.relu(nn.Conv(w, (3, 1), padding="SAME", name="c31a")(x))
        y = nn.Conv(w, (1, 3), padding="SAME", use_bias=False, name="c13a")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-3, name="bn1")(y))
        y = nn.relu(nn.Conv(w, (3, 1), padding="SAME",
                            kernel_dilation=(d, 1), name="c31b")(y))
        y = nn.Conv(w, (1, 3), padding="SAME", kernel_dilation=(1, d),
                    use_bias=False, name="c13b")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn2")(y)
        return nn.relu(x + y)


class ERFNet(nn.Module):
    """ERFNet encoder (erfnet.py): downsampler (conv‖maxpool concat) +
    non-bottleneck-1d stacks with growing dilation. Returns the three
    stage outputs (strides 2, 4, 8)."""

    channels: Sequence[int] = (16, 64, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def down(x, w, name):
            conv = nn.Conv(max(w - x.shape[-1], 1), (3, 3), strides=(2, 2),
                           padding="SAME", name=f"{name}_conv")(x)
            pool = nn.max_pool(x, (2, 2), strides=(2, 2))
            y = jnp.concatenate([conv, pool], axis=-1)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, name=f"{name}_bn")(y)
            return nn.relu(y)

        outs = []
        x = down(x, self.channels[0], "down1")
        outs.append(x)
        x = down(x, self.channels[1], "down2")
        for i in range(5):
            x = _NonBottleneck1D(x.shape[-1], name=f"nb1_{i}")(x, train=train)
        outs.append(x)
        x = down(x, self.channels[2], "down3")
        for r in range(2):
            for i, d in enumerate((2, 4, 8, 16)):
                x = _NonBottleneck1D(x.shape[-1], dilation=d,
                                     name=f"nb2_{r}_{i}")(x, train=train)
        outs.append(x)
        return tuple(outs)


class ICNeck(nn.Module):
    """ICNet cascade-feature-fusion neck (ic_neck.py): fuses 1/32, 1/16, 1/8
    branch maps pairwise with dilated conv + upsample (CascadeFeatureFusion).
    Input: (c_sub1, c_sub2, c_sub4) fine→coarse — the reference's ic_neck.py
    unpacks (x_sub1, x_sub2, x_sub4) the same way."""

    channels: int = 128

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        def cff(low, high, name):
            low = resize(low, high.shape[1:3], mode="bilinear",
                         align_corners=False)
            low = _cbr(low, self.channels, 3, 1, f"{name}_low", train,
                       act=None, dilation=2)
            high = _cbr(high, self.channels, 1, 1, f"{name}_high", train,
                        act=None)
            return nn.relu(low + high), low

        c1, c2, c3 = inputs  # fine → coarse; c3 is the coarsest (1/32) map
        fused24, low24 = cff(c3, c2, "cff24")
        fused12, low12 = cff(fused24, c1, "cff12")
        return (low24, low12, fused12)
