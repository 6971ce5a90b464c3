"""Time (noise-level) embeddings for the DDP denoiser.

Parity target: ``LearnedSinusoidalPosEmb`` + the 17→1024→1024 GELU MLP
(reference segmentation/mmseg/models/segmentors/ddp.py:31-46,102-112). The MLP
input is the *log-SNR* of the sampled time, not t itself (ddp.py:171-172).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


class LearnedSinusoidalPosEmb(nn.Module):
    """x -> [x, sin(2π·x·w), cos(2π·x·w)] with learned frequencies w.

    dim must be even; output dim is dim + 1 (the raw value is prepended).
    """

    dim: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.dim % 2 == 0
        half = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(stddev=1.0), (half,))
        freqs = x[:, None] * weights[None, :] * 2.0 * math.pi
        return jnp.concatenate([x[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeMLP(nn.Module):
    """LearnedSinusoidalPosEmb(16) → Linear(17→dim) → GELU → Linear(dim→dim).

    ``dim`` is 4 × decoder embed dims = 1024 in all DDP configs.
    """

    dim: int = 1024
    sinusoidal_dim: int = 16

    @nn.compact
    def __call__(self, log_snr: jnp.ndarray) -> jnp.ndarray:
        x = LearnedSinusoidalPosEmb(self.sinusoidal_dim)(log_snr)
        x = nn.Dense(self.dim)(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim)(x)
        return x
