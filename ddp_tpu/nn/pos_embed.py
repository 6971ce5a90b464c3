"""2-D sine positional encoding.

Parity target: mmcv/mmseg ``SinePositionalEncoding`` with num_feats=128,
normalize=True, offset=-0.5, temperature=10000
(segmentation/mmseg/models/utils/transformer.py:34-116; config
configs/ade/ddp_swin_t...py:99-103). The reference always calls it with an
all-zeros mask, so the cumsum over the "not-mask" degenerates to row/col index
+ 1 — we exploit that and compute the table statically in numpy once per shape.
"""
from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=64)
def sine_pos_embed(h: int, w: int, num_feats: int = 128, temperature: float = 10000.0,
                   offset: float = -0.5, eps: float = 1e-6) -> np.ndarray:
    """Returns [h*w, 2*num_feats] float32 (y-features first, then x)."""
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None, :]
    scale = 2.0 * math.pi
    y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
    x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin on even indices, cos on odd indices
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_feats)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, num_feats)
    pos = np.concatenate([pos_y, pos_x], axis=2)  # [h, w, 2*num_feats]
    return pos.reshape(h * w, 2 * num_feats)


from flax import linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class LearnedPositionalEncoding(nn.Module):
    """Learnable row/col position embedding
    (mmseg transformer.py:124-181 LearnedPositionalEncoding): per-axis
    embedding tables of size (num_embed, num_feats); each position gets
    concat(col_embed[x], row_embed[y]) → 2·num_feats channels.

    Returns [h*w, 2*num_feats] (x-features first, matching the reference's
    cat((x_embed, y_embed), dim=-1))."""

    num_feats: int = 128
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = nn.Embed(self.row_num_embed, self.num_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="row_embed")(jnp.arange(h))
        col = nn.Embed(self.col_num_embed, self.num_feats,
                       embedding_init=nn.initializers.uniform(1.0),
                       name="col_embed")(jnp.arange(w))
        pos = jnp.concatenate([
            jnp.tile(col[None, :, :], (h, 1, 1)),
            jnp.tile(row[:, None, :], (1, w, 1)),
        ], axis=-1)
        return pos.reshape(h * w, 2 * self.num_feats)
