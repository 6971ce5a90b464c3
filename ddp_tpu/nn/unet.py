"""Stable-Diffusion-style UNet + ControlNet encoder copy, TPU-first.

Parity targets:
  - UNetModel: controlnet/ldm/modules/diffusionmodules/openaimodel.py:412-797
    (ResBlock:162-275, Upsample:90-117, Downsample:133-160,
    timestep_embedding in util.py).
  - ControlledUnetModel: controlnet/cldm/cldm.py:22-45 (additive control
    residuals on skip connections + middle).
  - ControlNet: controlnet/cldm/cldm.py:48-305 (encoder copy + zero convs +
    input_hint_block, forward at :284-305).

TPU-first: NHWC, GroupNorm32 + SiLU, fused SDPA attention, static module
lists unrolled at trace time (depth is config-static), bf16-safe. Gradient
rematerialisation handled by wrapping blocks with jax.checkpoint at the
model level (models/controlnet.py), not ad-hoc per-layer flags.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import SpatialTransformer, zero_init


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding (ldm diffusionmodules/util.py:222-240).

    timesteps: [B] float/int; returns [B, dim].
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResBlock(nn.Module):
    """GN->SiLU->conv, +time emb (scale-shift or add), GN->SiLU->zero-conv,
    skip 1x1 when channels change (openaimodel.py:162-275)."""

    channels: int
    out_channels: Optional[int] = None
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels
        h = nn.GroupNorm(num_groups=32, name="in_norm")(x)
        h = jax.nn.silu(h)
        if self.up:
            h = upsample_nearest(h)
            x = upsample_nearest(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), (2, 2))
            x = nn.avg_pool(x, (2, 2), (2, 2))
        h = nn.Conv(out_ch, (3, 3), padding=1, name="in_conv")(h)

        emb_out = nn.Dense(out_ch * (2 if self.use_scale_shift_norm else 1),
                           name="emb_proj")(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.GroupNorm(num_groups=32, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = nn.GroupNorm(num_groups=32, name="out_norm")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, kernel_init=zero_init,
                    name="out_conv")(h)
        if out_ch != self.channels:
            x = nn.Conv(out_ch, (1, 1), name="skip")(x)
        return x + h


def upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), padding=1,
                       name="conv")(upsample_nearest(x))


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


class UNetConfig:
    """SD 1.5 defaults (controlnet/models/cldm_v15.yaml unet_config)."""

    def __init__(self, in_channels=4, model_channels=320, out_channels=4,
                 num_res_blocks=2, attention_resolutions=(4, 2, 1),
                 channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768,
                 transformer_depth=1, use_linear_in_transformer=False,
                 use_scale_shift_norm=False):
        self.in_channels = in_channels
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.num_res_blocks = num_res_blocks
        self.attention_resolutions = tuple(attention_resolutions)
        self.channel_mult = tuple(channel_mult)
        self.num_heads = num_heads
        self.context_dim = context_dim
        self.transformer_depth = transformer_depth
        self.use_linear_in_transformer = use_linear_in_transformer
        self.use_scale_shift_norm = use_scale_shift_norm

    def tiny(self):
        """Small config for tests."""
        return UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                          num_res_blocks=1, attention_resolutions=(2,),
                          channel_mult=(1, 2), num_heads=2, context_dim=16)

    def small(self):
        """Mid-size config for the from-scratch synthetic demo (r4: the
        'tiny' stack — 32ch, 1 res block, one 4×4 cross-attn — was the
        capacity ceiling behind the 10 dB PSNR plateau; this one keeps the
        same SD topology at ~1/25 the SD 1.5 width)."""
        return UNetConfig(in_channels=4, model_channels=64, out_channels=4,
                          num_res_blocks=2, attention_resolutions=(1, 2),
                          channel_mult=(1, 2, 4), num_heads=4,
                          context_dim=64)


def _level_plan(cfg: UNetConfig):
    """Static (channels, has_attn) plan for encoder levels."""
    plan = []
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        ch = cfg.model_channels * mult
        plan.append((level, ch, ds in cfg.attention_resolutions, ds))
        ds *= 2
    return plan


class UNetEncoder(nn.Module):
    """input_blocks of the SD UNet; returns all skip activations.

    Shared by UNetModel and ControlNet (the ControlNet is an exact
    architectural copy of this half — cldm.py:48-280).
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, emb, context, hint=None):
        cfg = self.cfg
        h = nn.Conv(cfg.model_channels, (3, 3), padding=1, name="conv_in")(x)
        if hint is not None:  # ControlNet: add guided hint after first conv
            h = h + hint
        hs = [h]
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(h.shape[-1], ch,
                             cfg.use_scale_shift_norm,
                             name=f"res_{level}_{i}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = SpatialTransformer(
                        ch, cfg.num_heads, ch // cfg.num_heads,
                        cfg.transformer_depth, cfg.context_dim,
                        cfg.use_linear_in_transformer,
                        name=f"attn_{level}_{i}")(h, context)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2
        return h, hs


class UNetMiddle(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, h, emb, context):
        cfg = self.cfg
        ch = h.shape[-1]
        h = ResBlock(ch, ch, cfg.use_scale_shift_norm, name="mid_res1")(h, emb)
        h = SpatialTransformer(ch, cfg.num_heads, ch // cfg.num_heads,
                               cfg.transformer_depth, cfg.context_dim,
                               cfg.use_linear_in_transformer,
                               name="mid_attn")(h, context)
        h = ResBlock(ch, ch, cfg.use_scale_shift_norm, name="mid_res2")(h, emb)
        return h


class UNetModel(nn.Module):
    """Full SD UNet. ``control`` is an optional list of residuals
    (len = num skips + 1) applied as in ControlledUnetModel (cldm.py:23-45):
    last entry added to the middle output, the rest added to each popped skip.
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, control=None,
                 only_mid_control: bool = False):
        cfg = self.cfg
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, name="time_embed_0")(t_emb)
        emb = nn.Dense(cfg.model_channels * 4,
                       name="time_embed_2")(jax.nn.silu(emb))

        h, hs = UNetEncoder(cfg, name="encoder")(x, emb, context)
        h = UNetMiddle(cfg, name="middle")(h, emb, context)
        if control is not None:
            h = h + control[-1]
            control = list(control[:-1])

        # output_blocks mirror the encoder (openaimodel.py:683-724)
        ds = 2 ** (len(cfg.channel_mult) - 1)
        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.model_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                if control is not None and not only_mid_control:
                    skip = skip + control.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(h.shape[-1], ch, cfg.use_scale_shift_norm,
                             name=f"up_res_{level}_{i}")(h, emb)
                if ds in cfg.attention_resolutions:
                    h = SpatialTransformer(
                        ch, cfg.num_heads, ch // cfg.num_heads,
                        cfg.transformer_depth, cfg.context_dim,
                        cfg.use_linear_in_transformer,
                        name=f"up_attn_{level}_{i}")(h, context)
            if level != 0:
                h = Upsample(ch, name=f"up_{level}")(h)
                ds //= 2

        h = nn.GroupNorm(num_groups=32, name="out_norm")(h)
        h = jax.nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       kernel_init=zero_init, name="out_conv")(h)


class HintEncoder(nn.Module):
    """input_hint_block: 512x512 hint image -> model_channels at 1/8
    (cldm.py:109-120: convs 16,16,32,32,96,96,256 with strides 2 at 16->32,
    32->96, 96->256, final zero conv).

    ``downsample`` must match the first stage's spatial reduction (SD's
    VAE is 8x). For a shallower VAE, trailing stride-2 convs flip to
    stride 1 so the hint lands on the latent grid."""

    model_channels: int
    downsample: int = 8

    @nn.compact
    def __call__(self, hint):
        h = hint
        plan = [[16, 1], [16, 1], [32, 2], [32, 1], [96, 2], [96, 1],
                [256, 2]]
        n_extra = 3 - int(math.log2(self.downsample))
        for entry in reversed(plan):
            if n_extra <= 0:
                break
            if entry[1] == 2:
                entry[1] = 1
                n_extra -= 1
        for i, (ch, s) in enumerate(plan):
            h = nn.Conv(ch, (3, 3), strides=(s, s), padding=1,
                        name=f"conv_{i}")(h)
            h = jax.nn.silu(h)
        return nn.Conv(self.model_channels, (3, 3), padding=1,
                       kernel_init=zero_init, bias_init=zero_init,
                       name="zero_conv")(h)


class ControlNet(nn.Module):
    """Encoder copy + hint encoder + zero convs; returns the 13 control
    residuals (cldm.py:284-305)."""

    cfg: UNetConfig
    hint_channels: int = 3
    hint_downsample: int = 8

    @nn.compact
    def __call__(self, x, hint, timesteps, context):
        cfg = self.cfg
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, name="time_embed_0")(t_emb)
        emb = nn.Dense(cfg.model_channels * 4,
                       name="time_embed_2")(jax.nn.silu(emb))
        guided = HintEncoder(cfg.model_channels,
                             downsample=self.hint_downsample,
                             name="hint")(hint)
        h, hs = UNetEncoder(cfg, name="encoder")(x, emb, context, hint=guided)
        h = UNetMiddle(cfg, name="middle")(h, emb, context)
        outs = []
        for i, skip in enumerate(hs):
            outs.append(nn.Conv(skip.shape[-1], (1, 1), kernel_init=zero_init,
                                bias_init=zero_init,
                                name=f"zero_conv_{i}")(skip))
        outs.append(nn.Conv(h.shape[-1], (1, 1), kernel_init=zero_init,
                            bias_init=zero_init, name="middle_out")(h))
        return outs
