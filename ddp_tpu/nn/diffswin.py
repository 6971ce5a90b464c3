"""DiffSwin — Swin backbone with per-block FiLM time conditioning.

Parity target: the reference's experimental DDP-only backbone
``DiffSwinTransformer`` (segmentation/mmseg/models/backbones/diffswin.py:485,
427-471, 775-783): a model-level LearnedSinusoidalPosEmb(16) → MLP time
embedding; each stage owns a SiLU→Linear(time_dim→2C) MLP whose (scale,
shift) is applied AFTER every block's FFN residual as x·(scale+1)+shift.

Reuses this package's SwinBlock/PatchMerging (nn/swin.py); the FiLM hook is
at block-output granularity, matching the reference's `_inner_forward`
(diffswin.py:359-377).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .swin import PatchMerging, SwinBlock
from .time_embed import TimeMLP


class DiffSwinTransformer(nn.Module):
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.3
    out_indices: Sequence[int] = (0, 1, 2, 3)
    patch_norm: bool = True
    time_dim: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, ...]:
        """x: [B, H, W, 3] image; t: [B] diffusion time (continuous)."""
        p = self.patch_size
        pad_h = (-x.shape[1]) % p
        pad_w = (-x.shape[2]) % p
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        time = TimeMLP(self.time_dim, name="time_mlp")(t)  # [B, time_dim]

        total = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, total)
        outs = []
        block_idx = 0
        for stage, depth in enumerate(self.depths):
            dim = self.embed_dims * (2 ** stage)
            # per-stage FiLM (diffswin.py:460-473): one scale/shift pair
            # shared by all blocks of the stage
            ts = nn.Dense(dim * 2, name=f"stage{stage}_time")(nn.silu(time))
            scale, shift = jnp.split(ts[:, None, None, :], 2, axis=-1)
            for blk in range(depth):
                x = SwinBlock(
                    dim, self.num_heads[stage], self.window,
                    shift=0 if blk % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[block_idx]),
                    name=f"stage{stage}_block{blk}",
                )(x, train=train)
                x = x * (scale + 1.0) + shift
                block_idx += 1
            if stage in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim * 2, name=f"downsample{stage}")(x)
        return tuple(outs)
