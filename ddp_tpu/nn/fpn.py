"""FPN neck + MultiStageMerging — the DDP feature fusion path.

Parity targets:
  - mmseg FPN (lateral 1x1 convs + top-down nearest upsample + 3x3 output
    convs, GN-32, no activation) as configured at
    configs/ade/ddp_swin_t...py:40-46.
  - MultiStageMerging (segmentation/mmseg/models/necks/multi_stage_merging.py:
    11-52): bilinear-resize every level to level-0 size, concat, 1x1 conv.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize
from .common import ConvModule


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    norm: str = "GN"

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True):
        laterals = [
            ConvModule(self.out_channels, (1, 1), norm=self.norm, name=f"lateral{i}")(
                x, train=train
            )
            for i, x in enumerate(inputs)
        ]
        # top-down pathway, nearest upsampling (mmseg FPN default)
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize(laterals[i], (h, w), mode="nearest")
        outs = [
            ConvModule(self.out_channels, (3, 3), norm=self.norm, name=f"fpn{i}")(
                laterals[i], train=train
            )
            for i in range(len(laterals))
        ]
        return tuple(outs[: self.num_outs])


class MultiStageMerging(nn.Module):
    out_channels: int = 256
    norm: str = "GN"
    align_corners: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = True) -> jnp.ndarray:
        h, w = inputs[0].shape[1:3]
        ups = [
            resize(x, (h, w), mode="bilinear", align_corners=self.align_corners)
            for x in inputs
        ]
        x = jnp.concatenate(ups, axis=-1)
        return ConvModule(self.out_channels, (1, 1), norm=self.norm, name="down")(
            x, train=train
        )
