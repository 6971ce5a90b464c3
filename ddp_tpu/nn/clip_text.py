"""CLIP ViT-L/14 text encoder — the frozen SD conditioning model.

Parity target: FrozenCLIPEmbedder (controlnet/ldm/modules/encoders/
modules.py:88-115), which wraps HF ``CLIPTextModel``; we implement the text
transformer natively in flax (causal mask, quick-gelu, final LN, 77 tokens,
12 layers x 768) so weights import straight from an SD checkpoint via
``ddp_tpu.train.torch_import`` with zero torch dependency at inference.

Tokenization: this module consumes token ids. When the ``transformers``
tokenizer assets are available locally, ``tokenize`` uses them; otherwise
callers pass precomputed ids (the environment has no network egress, so the
BPE vocab may be absent — ids-in is the stable API).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import multihead_attention


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(name="ln_1")(x)
        qkv = nn.Dense(self.width * 3, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        d = self.width // self.heads
        attn = jax.nn.dot_product_attention(
            q.reshape(b, n, self.heads, d), k.reshape(b, n, self.heads, d),
            v.reshape(b, n, self.heads, d), is_causal=True)
        x = x + nn.Dense(self.width, name="out_proj")(attn.reshape(b, n, -1))
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="fc1")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.width, name="fc2")(h)


class CLIPTextEncoder(nn.Module):
    """Returns last_hidden_state [B, T, width] (the `last` layer mode the SD
    FrozenCLIPEmbedder uses, modules.py:99)."""

    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (self.max_len, self.width))
        x = tok + pos[None, : ids.shape[1]]
        mask = None
        for i in range(self.layers):
            x = CLIPTextBlock(self.width, self.heads, name=f"block_{i}")(x, mask)
        return nn.LayerNorm(name="ln_final")(x)


_BOS, _EOS = 49406, 49407


def tokenize(texts: Sequence[str], max_len: int = 77) -> np.ndarray:
    """Tokenize with the HF CLIP tokenizer when its assets are present
    locally; raises a clear error otherwise (zero-egress environment)."""
    try:
        from transformers import CLIPTokenizerFast

        tok = CLIPTokenizerFast.from_pretrained("openai/clip-vit-large-patch14",
                                                local_files_only=True)
    except Exception as e:  # pragma: no cover - depends on local assets
        raise RuntimeError(
            "CLIP tokenizer assets not available locally; pass precomputed "
            "token ids to CLIPTextEncoder instead") from e
    out = tok(list(texts), padding="max_length", truncation=True,
              max_length=max_len, return_tensors="np")
    return out["input_ids"].astype(np.int32)


def dummy_ids(batch: int, max_len: int = 77) -> np.ndarray:
    """BOS + EOS-padded ids — the empty-prompt encoding used for
    unconditional guidance rows (ControlLDM.get_unconditional_conditioning,
    cldm.py:344-346 encodes [""] * N)."""
    ids = np.full((batch, max_len), _EOS, np.int32)
    ids[:, 0] = _BOS
    return ids
