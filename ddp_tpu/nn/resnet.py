"""ResNet / ResNeXt backbone family, NHWC.

Parity target: mmseg's ResNet zoo (segmentation/mmseg/models/backbones/
resnet.py — ResNet, ResNetV1c/V1d deep-stem variants, dilation-based output
strides; resnext.py grouped bottlenecks). Shipped by the reference for
inheritance compatibility (SURVEY.md §2.3); DDP's own configs use Swin /
ConvNeXt, so this exists for the non-diffusion heads and ablations.

TPU-first notes: NHWC layout, strides folded into the 3x3 conv of each block
(mmseg's style_pytorch=True), BatchNorm is automatically "sync" under a
batch-sharded mesh (see nn/common.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import BatchNorm


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, padding="SAME",
                    use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            identity = BatchNorm(name="down_bn")(identity,
                                                 use_running_average=not train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1  # >1 = ResNeXt
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        if self.groups > 1:
            width = int(self.features * (self.width_per_group / 64.0)) * self.groups
        else:
            width = self.features
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2, padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            identity = BatchNorm(name="down_bn")(identity,
                                                 use_running_average=not train)
        return nn.relu(y + identity)


_DEPTH_CFG = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """ResNet with mmseg's segmentation defaults: deep 3x3x3 stem (V1c),
    strides (1,2,2,2) or dilation (1,1,2,4) for output-stride 8."""

    depth: int = 50
    deep_stem: bool = True  # V1c
    stem_channels: int = 64
    base_channels: int = 64
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_type, depths = _DEPTH_CFG[self.depth]
        if self.deep_stem:
            for i, (f, s) in enumerate(
                    [(self.stem_channels // 2, 2), (self.stem_channels // 2, 1),
                     (self.stem_channels, 1)]):
                x = nn.Conv(f, (3, 3), strides=(s, s), padding="SAME",
                            use_bias=False, name=f"stem_conv{i}")(x)
                x = BatchNorm(name=f"stem_bn{i}")(x, use_running_average=not train)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2),
                        padding="SAME", use_bias=False, name="stem_conv0")(x)
            x = BatchNorm(name="stem_bn0")(x, use_running_average=not train)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for stage, num_blocks in enumerate(depths):
            feats = self.base_channels * (2 ** stage)
            stride = self.strides[stage]
            dilation = self.dilations[stage]
            for blk in range(num_blocks):
                s = stride if blk == 0 else 1
                expansion = 4 if block_type == "bottleneck" else 1
                need_down = blk == 0 and (s != 1 or x.shape[-1] != feats * expansion)
                cls = Bottleneck if block_type == "bottleneck" else BasicBlock
                kw = dict(features=feats, stride=s, dilation=dilation,
                          downsample=need_down,
                          name=f"stage{stage}_block{blk}")
                if block_type == "bottleneck":
                    kw.update(groups=self.groups, width_per_group=self.width_per_group)
                x = cls(**kw)(x, train=train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)


def resnext(depth: int = 101, groups: int = 32, width_per_group: int = 4,
            **kw) -> ResNet:
    """ResNeXt factory (mmseg resnext.py semantics)."""
    return ResNet(depth=depth, groups=groups, width_per_group=width_per_group, **kw)
