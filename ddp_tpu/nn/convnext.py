"""ConvNeXt backbone (T/S/B/L), NHWC.

Parity target: mmcls ConvNeXt as used by the Cityscapes DDP configs
(configs/cityscapes/ddp_convnext_l_4x4_512x1024_160k_cityscapes.py:6-25):
4-stage, stem 4x4/4 + LN, 2x2/2 LN-conv downsamplers, blocks of
dwconv7x7 → LN → pwconv(4x) → GELU → pwconv → layer-scale → drop-path,
LN on each output stage.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import DropPath, trunc_normal_init


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
                    name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                               (self.dim,))
            x = x * gamma
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic=not train)
        return shortcut + x


class ConvNeXt(nn.Module):
    """Returns features from ``out_indices`` stages, NHWC."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.4
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        outs = []
        block_idx = 0
        for stage, depth in enumerate(self.depths):
            if stage == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                            name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm{stage}")(x)
                x = nn.Conv(self.dims[stage], (2, 2), strides=(2, 2), padding="VALID",
                            name=f"down_conv{stage}")(x)
            for blk in range(depth):
                x = ConvNeXtBlock(self.dims[stage], drop_path=float(dpr[block_idx]),
                                  name=f"stage{stage}_block{blk}")(x, train=train)
                block_idx += 1
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6, name=f"out_norm{stage}")(x))
        return tuple(outs)


def convnext_variant(name: str) -> dict:
    variants = {
        # 'nano' is a test-only scale (not in the reference) for fast CPU CI
        "nano": dict(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128)),
        "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
        "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
        "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
        "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    }
    return dict(variants[name])
