"""Compat backbones I: MobileNetV2/V3, HRNet, UNet, ResNeSt (NHWC, flax).

TPU-native re-designs of mmseg-inherited backbones the reference ships
(SURVEY.md §2.3: segmentation/mmseg/models/backbones/{mobilenet_v2,
mobilenet_v3,hrnet,unet,resnest}.py). All return a tuple of feature maps
selected by ``out_indices``, matching this repo's backbone contract
(see convnext.py / swin.py)."""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule
from .resnet import ResNet


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class _SE(nn.Module):
    """Squeeze-excitation with configurable gate (MobileNetV3 uses hsigmoid)."""

    channels: int
    ratio: int = 4
    gate: str = "hsigmoid"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.channels // self.ratio, (1, 1), name="fc1")(s))
        s = nn.Conv(self.channels, (1, 1), name="fc2")(s)
        s = _hsigmoid(s) if self.gate == "hsigmoid" else nn.sigmoid(s)
        return x * s


class _InvertedResidual(nn.Module):
    """MobileNet inverted residual: 1x1 expand → dw kxk → (SE) → 1x1 project."""

    out: int
    expand: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    se: bool = False
    act: str = "relu"  # 'relu' | 'hswish'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = _hswish if self.act == "hswish" else nn.relu6
        inp = x.shape[-1]
        y = x
        if self.expand != inp:
            y = nn.Conv(self.expand, (1, 1), use_bias=False, name="expand")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="expand_bn")(y)
            y = act(y)
        y = nn.Conv(self.expand, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.expand, padding="SAME",
                    use_bias=False, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="dw_bn")(y)
        y = act(y)
        if self.se:
            y = _SE(self.expand, name="se")(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, name="project")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="project_bn")(y)
        if self.stride == 1 and inp == self.out:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    """MobileNetV2 seg backbone (mmseg mobilenet_v2.py): 7 stages, the last
    two dilated (strides (1,2,2,2,1,1,1), dilations (1,1,1,1,1,2,4)),
    out_indices (1,2,4,6) at 1/4..1/8 scales."""

    widths: Sequence[int] = (16, 24, 32, 64, 96, 160, 320)
    repeats: Sequence[int] = (1, 2, 3, 4, 3, 3, 1)
    strides: Sequence[int] = (1, 2, 2, 2, 1, 1, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 2, 4)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = nn.Conv(int(32 * self.width_mult), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn")(x)
        x = nn.relu6(x)
        outs = []
        for si, (w, r, s, d) in enumerate(zip(
                self.widths, self.repeats, self.strides, self.dilations)):
            w = int(w * self.width_mult)
            for bi in range(r):
                expand = x.shape[-1] * (1 if si == 0 and bi == 0 else 6)
                x = _InvertedResidual(
                    w, expand, stride=s if bi == 0 else 1, dilation=d,
                    name=f"stage{si}_block{bi}")(x, train=train)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)


# (kernel, expand, out, se, act, stride) per block — MobileNetV3-Large,
# dilated tail for seg (mmseg mobilenet_v3.py arch_settings['large'])
_V3_LARGE = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hswish", 2),
    (3, 200, 80, False, "hswish", 1),
    (3, 184, 80, False, "hswish", 1),
    (3, 184, 80, False, "hswish", 1),
    (3, 480, 112, True, "hswish", 1),
    (3, 672, 112, True, "hswish", 1),
    (5, 672, 160, True, "hswish", 2),
    (5, 960, 160, True, "hswish", 1),
    (5, 960, 160, True, "hswish", 1),
]
_V3_SMALL = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
]


class MobileNetV3(nn.Module):
    """MobileNetV3 backbone (mmseg mobilenet_v3.py). out_indices default to
    the LR-ASPP taps ((1,3,16) large / (0,1,12) small in mmseg block space —
    here exposed as 'early / mid / final conv' taps).

    With ``dilated=True`` (default, mmseg's unconditional seg conversion,
    mobilenet_v3.py:199-241) the last two downsampling blocks are converted to
    stride 1 and the tail runs dilated (2 then 4), so the final tap comes out
    at output stride 8 instead of 32 — the resolution LR-ASPP expects."""

    arch: str = "large"
    out_indices: Sequence[int] = ()
    dilated: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        cfg = _V3_LARGE if self.arch == "large" else _V3_SMALL
        default_taps = (1, 3) if self.arch == "large" else (0, 1)
        taps = tuple(self.out_indices) or default_taps
        # seg conversion (mmseg mobilenet_v3.py:199-241, 0-based block idx):
        # large: blocks 6 & 12 stride->1; blocks 7..12 dilation 2, 13.. 4.
        # small: blocks 3 & 8 stride->1; blocks 4..8 dilation 2, 9.. 4.
        if self.dilated:
            destride = (6, 12) if self.arch == "large" else (3, 8)
            dil2 = (range(7, 13) if self.arch == "large" else range(4, 9))
        else:
            destride, dil2 = (), range(0)
        stem_w = 16
        x = nn.Conv(stem_w, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn")(x)
        x = _hswish(x)
        outs = []
        for i, (k, e, o, se, act, s) in enumerate(cfg):
            if self.dilated:
                if i in destride:
                    s = 1
                d = 2 if i in dil2 else (4 if i > max(destride) else 1)
            else:
                d = 1
            x = _InvertedResidual(o, e, kernel=k, stride=s, se=se, act=act,
                                  dilation=d, name=f"block{i}")(x, train=train)
            if i in taps:
                outs.append(x)
        # final 1x1 conv tap (mmseg appends a conv layer as the last output)
        x = nn.Conv(x.shape[-1] * 6, (1, 1), use_bias=False, name="last_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="last_bn")(x)
        x = _hswish(x)
        outs.append(x)
        return tuple(outs)


class _HRBasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        y = bn("bn2")(y)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(identity + y)


class HRNet(nn.Module):
    """HRNet (mmseg hrnet.py): parallel multi-resolution streams with full
    cross-resolution fusion after every stage. ``widths`` are the per-branch
    channel counts (W18 = (18,36,72,144)); ``blocks_per_stage`` the number of
    basic blocks per branch per stage module. Returns all 4 branch maps
    (strides 4/8/16/32)."""

    widths: Sequence[int] = (18, 36, 72, 144)
    blocks_per_stage: int = 2
    stage_modules: Sequence[int] = (1, 1, 2)  # modules in stages 2..4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)

        # stem: two 3x3/2 convs → 1/4 scale
        x = nn.relu(bn("stem_bn1")(nn.Conv(64, (3, 3), strides=(2, 2),
                                           padding="SAME", use_bias=False,
                                           name="stem1")(x)))
        x = nn.relu(bn("stem_bn2")(nn.Conv(64, (3, 3), strides=(2, 2),
                                           padding="SAME", use_bias=False,
                                           name="stem2")(x)))
        # stage 1: bottleneck layer at 1/4 (simplified to basic blocks at
        # width[0]*4 → transition convs, preserving mmseg channel flow)
        for i in range(self.blocks_per_stage):
            x = _HRBasicBlock(64, name=f"layer1_{i}")(x, train=train)

        branches = [x]
        for stage, n_modules in enumerate(self.stage_modules, start=2):
            n_br = stage  # stage 2 → 2 branches, ...
            # transition: add one new lower-resolution branch, match widths
            new_branches = []
            for b in range(n_br):
                w = self.widths[b]
                if b < len(branches):
                    y = branches[b]
                    if y.shape[-1] != w:
                        y = nn.relu(bn(f"t{stage}_{b}_bn")(
                            nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                                    name=f"t{stage}_{b}")(y)))
                else:
                    y = nn.relu(bn(f"t{stage}_{b}_bn")(
                        nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                                use_bias=False,
                                name=f"t{stage}_{b}")(branches[-1])))
                new_branches.append(y)
            branches = new_branches
            # stage modules: per-branch blocks + full fusion
            for m in range(n_modules):
                branches = [
                    _stack_blocks(branches[b], self.widths[b],
                                  self.blocks_per_stage,
                                  name_prefix=f"s{stage}m{m}b{b}", train=train)
                    for b in range(n_br)
                ]
                fused = []
                for i in range(n_br):
                    acc = branches[i]
                    hi, wi = acc.shape[1:3]
                    for j in range(n_br):
                        if j == i:
                            continue
                        y = branches[j]
                        if j > i:  # upsample lower-res branch
                            y = nn.Conv(self.widths[i], (1, 1), use_bias=False,
                                        name=f"f{stage}m{m}_{j}to{i}")(y)
                            y = bn(f"f{stage}m{m}_{j}to{i}_bn")(y)
                            y = resize(y, (hi, wi), mode="bilinear",
                                       align_corners=False)
                        else:  # strided 3x3 downsample chain
                            for d in range(i - j):
                                last = d == i - j - 1
                                cw = self.widths[i] if last else self.widths[j]
                                y = nn.Conv(cw, (3, 3), strides=(2, 2),
                                            padding="SAME", use_bias=False,
                                            name=f"f{stage}m{m}_{j}to{i}_d{d}")(y)
                                y = bn(f"f{stage}m{m}_{j}to{i}_d{d}_bn")(y)
                                if not last:
                                    y = nn.relu(y)
                        acc = acc + y
                    fused.append(nn.relu(acc))
                branches = fused
        return tuple(branches)


def _stack_blocks(x, width, n, name_prefix, train):
    # helper called from HRNet.__call__'s compact scope: child modules
    # register to the enclosing HRNet via flax's dynamic module context
    for i in range(n):
        x = _HRBasicBlock(width, name=f"{name_prefix}_{i}")(x, train=train)
    return x


class UNetBackbone(nn.Module):
    """UNet encoder-decoder backbone (mmseg unet.py): conv-conv stages with
    maxpool downs and bilinear-up + skip-concat decoder. Returns the decoder
    feature maps coarsest→finest (mmseg returns all dec stages)."""

    base_channels: int = 64
    num_stages: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def block(x, w, name):
            for i in range(2):
                x = ConvModule(w, (3, 3), norm="BN", act="relu",
                               name=f"{name}_c{i}")(x, train=train)
            return x

        skips = []
        w = self.base_channels
        for s in range(self.num_stages):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                w *= 2
            x = block(x, w, f"enc{s}")
            skips.append(x)
        outs = [skips[-1]]
        for s in range(self.num_stages - 2, -1, -1):
            w //= 2
            x = resize(x, skips[s].shape[1:3], mode="bilinear",
                       align_corners=False)
            x = block(jnp.concatenate([x, skips[s]], axis=-1), w, f"dec{s}")
            outs.append(x)
        return tuple(outs)


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention conv (radix-major softmax over splits)."""

    features: int
    radix: int = 2
    groups: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        r, f = self.radix, self.features
        y = nn.Conv(f * r, (3, 3), strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=self.groups * r, use_bias=False,
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(y)
        y = nn.relu(y)
        b, h, w, _ = y.shape
        splits = y.reshape(b, h, w, r, f)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2))  # [B, F]
        inter = max(f * r // 4, 32)
        a = nn.relu(nn.Dense(inter, name="fc1")(gap))
        a = nn.Dense(f * r, name="fc2")(a).reshape(b, r, f)
        a = nn.softmax(a, axis=1) if r > 1 else nn.sigmoid(a)
        return jnp.einsum("bhwrf,brf->bhwf", splits, a)


class ResNeSt(ResNet):
    """ResNeSt-style backbone: the repo's ResNet trunk with split-attention
    3x3 convs would require block surgery; instead this subclass swaps the
    bottleneck grouping for radix-2 split attention via a parallel stem +
    stage stack (mmseg resnest.py semantics, TPU-simplified: avg-pool
    downsampling, radix 2, groups 1)."""

    radix: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)

        # deep stem (3 convs), as mmseg ResNeSt always uses
        for i, w in enumerate((32, 32, 64)):
            x = nn.relu(bn(f"stem_bn{i}")(
                nn.Conv(w, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding="SAME", use_bias=False, name=f"stem{i}")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        stage_blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        outs = []
        w = self.base_channels
        for s, n_blocks in enumerate(stage_blocks):
            for i in range(n_blocks):
                stride = 2 if (s > 0 and i == 0) else 1
                identity = x
                y = nn.relu(bn(f"s{s}b{i}_bn1")(
                    nn.Conv(w, (1, 1), use_bias=False,
                            name=f"s{s}b{i}_conv1")(x)))
                if stride > 1:  # ResNeSt: avg-pool before the 3x3
                    y = nn.avg_pool(y, (3, 3), strides=(2, 2), padding="SAME")
                y = SplitAttentionConv(w, radix=self.radix,
                                       name=f"s{s}b{i}_splat")(y, train=train)
                y = bn(f"s{s}b{i}_bn3")(
                    nn.Conv(w * 4, (1, 1), use_bias=False,
                            name=f"s{s}b{i}_conv3")(y))
                if identity.shape != y.shape:
                    if stride > 1:
                        identity = nn.avg_pool(identity, (2, 2),
                                               strides=(2, 2), padding="SAME")
                    identity = bn(f"s{s}b{i}_down_bn")(
                        nn.Conv(w * 4, (1, 1), use_bias=False,
                                name=f"s{s}b{i}_down")(identity))
                x = nn.relu(identity + y)
            if s in self.out_indices:
                outs.append(x)
            w *= 2
        return tuple(outs)
