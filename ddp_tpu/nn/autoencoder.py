"""AutoencoderKL — the SD first-stage VAE, TPU-first NHWC.

Parity targets: controlnet/ldm/models/autoencoder.py:13-115 (AutoencoderKL,
encode->DiagonalGaussian, decode) and
controlnet/ldm/modules/diffusionmodules/model.py (Encoder:368-494,
Decoder:505-634, ResnetBlock:35-96, AttnBlock:119-160,
Down/Upsample:14-33). SD 1.5 config: ch=128, ch_mult=(1,2,4,4),
num_res_blocks=2, z_channels=4, double_z, no attn resolutions (mid attn only).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import VAEAttnBlock


def _gn(c: int) -> int:
    """32 groups as in the reference; degrade gracefully for tiny test dims."""
    import math

    return math.gcd(32, c)


class VAEResnetBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=_gn(x.shape[-1]), epsilon=1e-6,
                         name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_gn(self.out_channels), epsilon=1e-6,
                         name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="nin_shortcut")(x)
        return x + h


class VAEEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            ch = self.ch * mult
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(ch, name=f"down_{level}_block_{i}")(h)
            if level != len(self.ch_mult) - 1:
                # asymmetric pad then stride-2 conv (model.py:14-24)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down_{level}_downsample")(h)
        ch = self.ch * self.ch_mult[-1]
        h = VAEResnetBlock(ch, name="mid_block_1")(h)
        h = VAEAttnBlock(ch, name="mid_attn")(h)
        h = VAEResnetBlock(ch, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6,
                         name="norm_out")(h)
        h = jax.nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class VAEDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3

    @nn.compact
    def __call__(self, z):
        ch = self.ch * self.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = VAEResnetBlock(ch, name="mid_block_1")(h)
        h = VAEAttnBlock(ch, name="mid_attn")(h)
        h = VAEResnetBlock(ch, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            ch = self.ch * self.ch_mult[level]
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(ch, name=f"up_{level}_block_{i}")(h)
            if level != 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up_{level}_upsample")(h)
        h = nn.GroupNorm(num_groups=_gn(h.shape[-1]), epsilon=1e-6,
                         name="norm_out")(h)
        h = jax.nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode() returns (mean, logvar); sample with the reparam trick;
    decode() maps latents back to images. quant/post_quant 1x1 convs as in
    autoencoder.py:63-80."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_channels: int = 3

    def setup(self):
        self.encoder = VAEEncoder(self.ch, self.ch_mult, self.num_res_blocks,
                                  z_channels=self.embed_dim)
        self.decoder = VAEDecoder(self.ch, self.ch_mult, self.num_res_blocks,
                                  out_channels=self.out_channels)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1))

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = True):
        mean, logvar = self.encode(x)
        if sample_posterior and rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z), mean, logvar
