"""DLA and VoVNet backbones — the remaining BEVFusion camera-backbone
options (bev/mmdet3d/models/backbones/dla.py, vovnet.py). NHWC flax
re-designs of the reference topologies:

  - DLA (deep layer aggregation): binary aggregation Trees per stage with
    Root fusion nodes (dla.py:126-242); DLA-34 layout by default.
  - VoVNet: One-Shot-Aggregation stages — K sequential 3x3 convs whose
    outputs (plus the input) concat once into a 1x1 projection, with
    effective-SE channel gating (vovnet.py:168-237); V2-19 slim by default.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


class _DLABasic(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = _bn(train, "bn2")(y)
        return nn.relu(y + residual)


class _Root(nn.Module):
    channels: int
    shortcut: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name="conv")(jnp.concatenate(xs, axis=-1))
        y = _bn(train, "bn")(y)
        if self.shortcut:
            y = y + xs[0]
        return nn.relu(y)


class _Tree(nn.Module):
    """Binary aggregation tree (dla.py:156-242)."""

    levels: int
    channels: int
    stride: int = 1
    level_root: bool = False
    root_shortcut: bool = False

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = list(children) if children else []
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride,) * 2, (self.stride,) * 2)
        else:
            bottom = x
        if x.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, (1, 1), use_bias=False,
                               name="project")(bottom)
            residual = _bn(train, "project_bn")(residual)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = _DLABasic(self.channels, self.stride, name="tree1")(
                x, residual, train=train)
            x2 = _DLABasic(self.channels, name="tree2")(x1, train=train)
            return _Root(self.channels, self.root_shortcut, name="root")(
                [x2, x1] + children, train=train)
        x1 = _Tree(self.levels - 1, self.channels, self.stride,
                   root_shortcut=self.root_shortcut, name="tree1")(
            x, train=train)
        return _Tree(self.levels - 1, self.channels, level_root=False,
                     root_shortcut=self.root_shortcut, name="tree2")(
            x1, children + [x1], train=train)


class DLA(nn.Module):
    """DLA-34 by default: levels (1,1,1,2,2,1), channels
    (16,32,64,128,256,512); returns the four stride-4..32 stages."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        x = nn.Conv(ch[0], (7, 7), padding=3, use_bias=False, name="base")(x)
        x = nn.relu(_bn(train, "base_bn")(x))
        # level0: conv stride 1; level1: conv stride 2
        x = nn.Conv(ch[0], (3, 3), padding=1, use_bias=False, name="l0")(x)
        x = nn.relu(_bn(train, "l0_bn")(x))
        x = nn.Conv(ch[1], (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    name="l1")(x)
        x = nn.relu(_bn(train, "l1_bn")(x))
        outs = []
        for i in range(2, 6):
            x = _Tree(self.levels[i], ch[i], stride=2, level_root=(i > 2),
                      name=f"level{i}")(x, train=train)
            outs.append(x)
        return tuple(outs)


class _eSE(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.channels, (1, 1), name="fc")(s)
        return x * jnp.clip((s + 3.0) / 6.0, 0.0, 1.0)  # hsigmoid gate


class _OSA(nn.Module):
    stage_ch: int
    concat_ch: int
    layers: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        feats = [x]
        for i in range(self.layers):
            x = nn.Conv(self.stage_ch, (3, 3), padding=1, use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.relu(_bn(train, f"bn{i}")(x))
            feats.append(x)
        y = nn.Conv(self.concat_ch, (1, 1), use_bias=False, name="concat")(
            jnp.concatenate(feats, axis=-1))
        y = nn.relu(_bn(train, "concat_bn")(y))
        y = _eSE(self.concat_ch, name="ese")(y)
        if self.identity:
            y = y + inp
        return y


class VoVNet(nn.Module):
    """VoVNetV2-19-slim by default: stem 64/64/128, OSA stages with
    (stage_ch, concat_ch, blocks) per stage; returns 4 stage maps."""

    stage_ch: Sequence[int] = (64, 80, 96, 112)
    concat_ch: Sequence[int] = (112, 256, 384, 512)
    blocks: Sequence[int] = (1, 1, 1, 1)
    osa_layers: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (c, s) in enumerate(((64, 2), (64, 1), (128, 1))):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding=1, use_bias=False,
                        name=f"stem{i}")(x)
            x = nn.relu(_bn(train, f"stem{i}_bn")(x))
        outs = []
        for si, (sc, cc, nb) in enumerate(zip(self.stage_ch, self.concat_ch,
                                              self.blocks)):
            if si > 0:
                x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
            for bi in range(nb):
                x = _OSA(sc, cc, self.osa_layers,
                         identity=(bi > 0), name=f"s{si}_osa{bi}")(
                    x, train=train)
            outs.append(x)
        return tuple(outs)
