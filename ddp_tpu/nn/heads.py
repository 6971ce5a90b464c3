"""Decode heads: the time-conditioned deformable denoising head and the FCN
auxiliary head.

Parity targets:
  - DeformableHeadWithTime (segmentation/mmseg/models/decode_heads/
    deformable_head_with_time.py:21-189): flatten HW → sine pos-enc → 6-layer
    time-FiLM deformable encoder → reshape → 1x1 conv_seg.
  - FCNHead (mmseg fcn_head.py; config configs/ade/ddp_swin_t...py:54-68):
    one 3x3 conv+BN+ReLU, dropout 0.1, 1x1 conv_seg, loss weight 0.4.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import ConvModule
from .pos_embed import LearnedPositionalEncoding, sine_pos_embed
from .transformer import TimeFiLMEncoder, reference_points


class DeformableHeadWithTime(nn.Module):
    num_classes: int
    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    attn_type: str = "msda"  # 'msda' faithful | 'window' TPU-native dense
    film: str = "v1"  # 'v1' | 'v2' | 'v3' layer variants
    pos_type: str = "sine"  # 'sine' | 'learned'
    remat: bool = False  # jax.checkpoint each decoder layer (train memory)
    # window-attention grid size (attn_type='window' only). 8 matches the
    # original TPU-native decoder; 16 with num_heads=4 is the measured-fast
    # shape (decoder_microbench.json: backward's tiny per-head matmuls are
    # the cost — bigger windows x 64-dim heads cut decoder train 29%)
    window: int = 8

    def _pos(self, h, w, dtype):
        if self.pos_type == "learned":
            return LearnedPositionalEncoding(
                self.embed_dims // 2, row_num_embed=max(50, h),
                col_num_embed=max(50, w), name="pos_enc")(h, w).astype(dtype)
        return jnp.asarray(sine_pos_embed(h, w, num_feats=self.embed_dims // 2),
                           dtype=dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        """x: [B, H, W, C] single-level features; time: [B, 4C] embedding.

        Returns per-pixel class logits [B, H, W, num_classes].
        """
        b, h, w, c = x.shape
        spatial_shapes = ((h, w),)
        pos = self._pos(h, w, x.dtype)  # [S, C]
        refs = jnp.asarray(reference_points(spatial_shapes), dtype=x.dtype)
        q = x.reshape(b, h * w, c)
        q = TimeFiLMEncoder(
            self.num_layers, self.embed_dims, self.num_heads, 1, self.num_points,
            self.ffn_dim, use_time=True, attn_type=self.attn_type,
            window=self.window, film=self.film, remat=self.remat,
            name="encoder",
        )(q, time, pos, refs, spatial_shapes)
        q = q.reshape(b, h, w, c)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(q)


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle: [B,H,W,C] → [B,H·s,W·s,C/s²].

    The reference's custom PixelShuffle (depth/.../deformable_head_with_time.py
    :264-281) uses a nonstandard channel→space permutation; for a from-scratch
    build the standard depth-to-space layout is used (same capability, no
    pretrained weights depend on the bit layout)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, scale, scale, c // (scale * scale))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * scale, w * scale, c // (scale * scale))


class DeformableDepthHead(nn.Module):
    """Depth variant of the time-FiLM deformable head: same encoder stack,
    1-channel ``conv_depth`` output with relu + min_depth (scale_up=False,
    use_eps=True — depth/depth/models/decode_heads/decode_head.py:258-270,
    config depth/configs/ddp_nyu/ddp_swint...py:64-67).

    ``variant``:
      'deform' — 1x1 conv_depth at encoder resolution (default).
      'upconv' — SpadeDeformableHeadWithTimeUpConv
                 (depth/.../deformable_head_with_time.py:285-352): encoder →
                 pixel-shuffle ×2 → 3x3 conv+ReLU → pixel-shuffle ×2 →
                 3x3 conv_depth, output at 4× the encoder resolution.
      'spade'  — SpadeDeformableHeadWithTime (:172-250): same compute as
                 'deform'; the reference forward also accepts a ``condition``
                 tensor that its default encoder ignores — accepted here for
                 signature parity and likewise unused.
    """

    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024
    min_depth: float = 1e-3
    attn_type: str = "msda"
    variant: str = "deform"  # 'deform' | 'upconv' | 'spade'
    film: str = "v1"
    remat: bool = False  # jax.checkpoint each decoder layer (train memory)
    # 'relu' is the reference parity form (decode_head.py:258-270). It has a
    # hard zero-gradient region: if conv_depth goes all-negative the head
    # dies (observed: grad_norm=0 from step ~100 on the synthetic converge
    # run). 'softplus' is the trainable-from-scratch option — identical
    # asymptotics, never zero-gradient. conv_depth bias starts at +0.5 in
    # both modes so the head is born alive (imports overwrite it).
    act: str = "relu"  # 'relu' | 'softplus'

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: Optional[jnp.ndarray],
                 train: bool = False,
                 condition: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        del condition  # parity: accepted, unused (see class docstring)
        b, h, w, c = x.shape
        spatial_shapes = ((h, w),)
        pos = jnp.asarray(sine_pos_embed(h, w, num_feats=self.embed_dims // 2),
                          dtype=x.dtype)
        refs = jnp.asarray(reference_points(spatial_shapes), dtype=x.dtype)
        q = x.reshape(b, h * w, c)
        q = TimeFiLMEncoder(
            self.num_layers, self.embed_dims, self.num_heads, 1, self.num_points,
            self.ffn_dim, use_time=True, attn_type=self.attn_type,
            film=self.film, remat=self.remat, name="encoder",
        )(q, time, pos, refs, spatial_shapes)
        q = q.reshape(b, h, w, c)
        if self.variant == "upconv":
            q = pixel_shuffle(q, 2)  # [B, 2h, 2w, C/4]
            q = ConvModule(c // 4, (3, 3), act="relu", name="up_conv")(
                q, train=train)
            q = pixel_shuffle(q, 2)  # [B, 4h, 4w, C/16]
            depth = nn.Conv(1, (3, 3), padding="SAME", name="conv_depth",
                            bias_init=nn.initializers.constant(0.5))(q)
        else:
            depth = nn.Conv(1, (1, 1), name="conv_depth",
                            bias_init=nn.initializers.constant(0.5))(q)
        pos = nn.softplus(depth) if self.act == "softplus" else nn.relu(depth)
        return pos + self.min_depth


class FCNHead(nn.Module):
    """Auxiliary FCN head on clean encoder features (deep supervision only)."""

    num_classes: int
    channels: int = 256
    num_convs: int = 1
    dropout: float = 0.1
    norm: str = "SyncBN"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_convs):
            x = ConvModule(self.channels, (3, 3), norm=self.norm, act="relu",
                           name=f"conv{i}")(x, train=train)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(x)


class ConvWithTime(nn.Module):
    """conv → norm → FiLM(time) → act — the reference's ConvWithTimeModule
    (fcn_head_with_time.py:18-226): when a time vector is given, a
    SiLU→Linear(T→2C) MLP produces (scale, shift) applied BEFORE the
    activation as x·(scale+1)+shift."""

    features: int
    kernel_size: tuple = (3, 3)
    dilation: int = 1
    norm: Optional[str] = "SyncBN"
    time_in: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        from .common import make_norm

        x = nn.Conv(self.features, self.kernel_size,
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", use_bias=self.norm is None, name="conv")(x)
        norm = make_norm(self.norm, train)
        if norm is not None:
            x = norm(x)
        if time is not None:
            t = nn.Dense(self.features * 2, name="time_mlp")(nn.silu(time))
            scale, shift = jnp.split(t[:, None, None, :], 2, axis=-1)
            x = x * (scale + 1.0) + shift
        return nn.relu(x)


class FCNHeadWithTime(nn.Module):
    """FCN denoising head with per-conv FiLM time conditioning — the
    reference's lightweight alternative to the deformable head
    (fcn_head_with_time.py:229-342: num_convs ConvWithTimeModule stack,
    optional concat_input conv_cat, then 1x1 conv_seg)."""

    num_classes: int
    channels: int = 256
    num_convs: int = 2
    kernel_size: int = 3
    dilation: int = 1
    concat_input: bool = True
    dropout: float = 0.1
    norm: Optional[str] = "SyncBN"

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        inputs = x
        for i in range(self.num_convs):
            x = ConvWithTime(self.channels, (self.kernel_size,) * 2,
                             dilation=self.dilation, norm=self.norm,
                             name=f"conv{i}")(x, time=time, train=train)
        if self.concat_input:
            x = ConvModule(self.channels, (self.kernel_size,) * 2,
                           norm=self.norm, act="relu", name="conv_cat")(
                jnp.concatenate([inputs, x], axis=-1), train=train)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(x)


class NNHead(nn.Module):
    """FCN stack WITHOUT a classifier (num_classes := channels) — the
    reference's NNHead (nn_head.py:11-96), used as a feature-space refiner."""

    channels: int = 256
    num_convs: int = 2
    kernel_size: int = 3
    dilation: int = 1
    concat_input: bool = True
    norm: Optional[str] = "SyncBN"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inputs = x
        for i in range(self.num_convs):
            x = ConvModule(self.channels, (self.kernel_size,) * 2,
                           norm=self.norm, act="relu", name=f"conv{i}")(
                x, train=train)
        if self.concat_input:
            x = ConvModule(self.channels, (self.kernel_size,) * 2,
                           norm=self.norm, act="relu", name="conv_cat")(
                jnp.concatenate([inputs, x], axis=-1), train=train)
        return x


class IdentityHead(nn.Module):
    """Pass-through head (identity conv_seg) — identity_head.py:8-16. Used by
    configs that take the decoder features as the output directly."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return x


class DeformableHead(nn.Module):
    """Deformable-attention head WITHOUT time conditioning — the reference's
    deformable_head.py:21-130 (same encoder, FiLM disabled). Used for
    non-diffusion ablations."""

    num_classes: int
    embed_dims: int = 256
    num_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    ffn_dim: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        spatial_shapes = ((h, w),)
        pos = jnp.asarray(sine_pos_embed(h, w, num_feats=self.embed_dims // 2),
                          dtype=x.dtype)
        refs = jnp.asarray(reference_points(spatial_shapes), dtype=x.dtype)
        q = x.reshape(b, h * w, c)
        q = TimeFiLMEncoder(
            self.num_layers, self.embed_dims, self.num_heads, 1, self.num_points,
            self.ffn_dim, use_time=False, name="encoder",
        )(q, None, pos, refs, spatial_shapes)
        q = q.reshape(b, h, w, c)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(q)
