"""Spatial transformer / cross-attention blocks for the latent-diffusion UNet.

Parity target: controlnet/ldm/modules/attention.py (CrossAttention:163,
BasicTransformerBlock, SpatialTransformer:218+, GEGLU FeedForward:59,
AttnBlock in ldm/modules/diffusionmodules/model.py:119 for the VAE).

TPU-first design: NHWC layout, one fused `jax.nn.dot_product_attention` per
block (XLA lowers this to a single fused attention kernel on TPU — no
(b h) n d reshuffles through HBM), bf16-safe with fp32 softmax accumulation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def zero_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def multihead_attention(
    q: jnp.ndarray,  # [B, Nq, H*D]
    k: jnp.ndarray,  # [B, Nk, H*D]
    v: jnp.ndarray,  # [B, Nk, H*D]
    num_heads: int,
) -> jnp.ndarray:
    """Fused SDPA with fp32 logits (attention.py:173-175 forces fp32)."""
    b, nq, hd = q.shape
    d = hd // num_heads
    q = q.reshape(b, nq, num_heads, d)
    # unify dtypes: under the bf16 policy a cross-attention query can arrive
    # f32 while context-derived k/v are bf16 (or vice versa) — SDPA requires
    # matching dtypes
    k = k.reshape(b, k.shape[1], num_heads, d).astype(q.dtype)
    v = v.reshape(b, v.shape[1], num_heads, d).astype(q.dtype)
    out = jax.nn.dot_product_attention(q, k, v)
    return out.reshape(b, nq, hd)


class CrossAttention(nn.Module):
    """q from x, k/v from context (self-attn when context is None).

    Reference: ldm/modules/attention.py:140-196 (to_q/to_k/to_v no-bias,
    to_out linear).
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        out = multihead_attention(q, k, v, self.heads)
        return nn.Dense(self.query_dim, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """FeedForward with GEGLU gate (attention.py:49-76, glu=True in SD)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        xg = nn.Dense(inner * 2, name="proj_in")(x)
        h, gate = jnp.split(xg, 2, axis=-1)
        h = h * jax.nn.gelu(gate)
        return nn.Dense(self.dim, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """self-attn -> cross-attn -> GEGLU FFN, pre-LN residuals
    (attention.py:196-217)."""

    dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        x = x + CrossAttention(self.dim, None, self.heads, self.dim_head,
                               name="attn1")(nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.dim, self.context_dim, self.heads,
                               self.dim_head, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context)
        x = x + GEGLUFeedForward(self.dim, name="ff")(
            nn.LayerNorm(name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> proj_in -> depth x transformer blocks on flattened HW ->
    zero-init proj_out -> residual (attention.py:218-291).

    x: [B, H, W, C] NHWC. ``use_linear`` selects Dense vs 1x1-conv projections
    (SD2 vs SD1 — numerically identical for 1x1).
    """

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    use_linear: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(inner, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(inner, self.context_dim, self.heads,
                                      self.dim_head,
                                      name=f"block_{i}")(x, context)
        x = nn.Dense(c, kernel_init=zero_init, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class VAEAttnBlock(nn.Module):
    """Single-head full self-attention used in the VAE mid block
    (ldm/modules/diffusionmodules/model.py:119-160)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        hn = hn.reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(hn)
        k = nn.Dense(c, name="k")(hn)
        v = nn.Dense(c, name="v")(hn)
        out = multihead_attention(q, k, v, num_heads=1)
        out = nn.Dense(c, name="proj_out")(out)
        return x + out.reshape(b, h, w, c)
