"""Slide (sliding-window) inference and flip test-time augmentation.

Parity target: mmseg ``EncoderDecoder.slide_inference``
(segmentation/mmseg/models/segmentors/encoder_decoder.py:181-227): a crop grid
with stride < crop accumulates logits and a count map, then divides. The DDP
seg configs use mode='whole', but slide is part of the framework surface
(and required for other mmseg heads / very large inputs).

TPU-first: the grid is static for a given (H, W, crop, stride), so the loop
unrolls at trace time into one XLA program; accumulation uses
dynamic_update_slice adds — no host round trips between crops.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def slide_grid(h: int, w: int, crop: Tuple[int, int], stride: Tuple[int, int]):
    """Crop origins, mmseg convention: last window is clamped flush to the
    border so every pixel is covered exactly."""
    ch, cw = crop
    sh, sw = stride
    h_grids = max((h - ch + sh - 1) // sh, 0) + 1
    w_grids = max((w - cw + sw - 1) // sw, 0) + 1
    origins = []
    for i in range(h_grids):
        for j in range(w_grids):
            y1 = min(i * sh, max(h - ch, 0))
            x1 = min(j * sw, max(w - cw, 0))
            origins.append((y1, x1))
    return origins


def slide_inference(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,  # [B, H, W, 3]
    num_classes: int,
    crop: Tuple[int, int],
    stride: Tuple[int, int],
) -> jnp.ndarray:
    """Accumulated-logit sliding-window inference. ``predict_fn`` maps a
    [B, ch, cw, 3] crop to [B, ch, cw, K] logits/probs. Returns [B, H, W, K].
    """
    b, h, w, _ = img.shape
    ch, cw = crop
    ch, cw = min(ch, h), min(cw, w)
    preds = jnp.zeros((b, h, w, num_classes), jnp.float32)
    count = jnp.zeros((1, h, w, 1), jnp.float32)
    for (y1, x1) in slide_grid(h, w, (ch, cw), stride):
        crop_img = jax.lax.dynamic_slice(img, (0, y1, x1, 0), (b, ch, cw, img.shape[-1]))
        logit = predict_fn(crop_img).astype(jnp.float32)
        pad = jax.lax.dynamic_update_slice(
            jnp.zeros_like(preds), logit, (0, y1, x1, 0)
        )
        preds = preds + pad
        cpad = jax.lax.dynamic_update_slice(
            jnp.zeros_like(count), jnp.ones((1, ch, cw, 1), jnp.float32), (0, y1, x1, 0)
        )
        count = count + cpad
    return preds / count


def flip_tta(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray], img: jnp.ndarray
) -> jnp.ndarray:
    """Horizontal-flip TTA: average predictions over (img, flip(img)),
    un-flipping the second (mmseg aug_test / depth flip-TTA
    encoder_decoder.py:210-226)."""
    out = predict_fn(img)
    out_f = predict_fn(img[:, :, ::-1])
    return 0.5 * (out + out_f[:, :, ::-1])


def multi_scale_flip_tta(
    predict_fn: Callable[[jnp.ndarray], jnp.ndarray],
    img: jnp.ndarray,  # [B, H, W, 3]
    scales: Tuple[float, ...] = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75),
    flip: bool = True,
) -> jnp.ndarray:
    """Multi-scale (+flip) test-time augmentation — mmseg MultiScaleFlipAug
    (segmentation/mmseg/datasets/pipelines/test_time_aug.py) + aug_test logit
    averaging (encoder_decoder.py:315-335). Each scale's prediction is
    bilinearly resized back to the input resolution and averaged; this is the
    reference's 'MS' eval protocol (README 'SS/MS' columns).

    Scale set is static → one XLA program over all scales.
    """
    from ..ops.resize import resize

    b, h, w, _ = img.shape
    acc = None
    for s in scales:
        hs, ws = int(round(h * s)), int(round(w * s))
        x = img if (hs, ws) == (h, w) else resize(img, (hs, ws), mode="bilinear")
        p = flip_tta(predict_fn, x) if flip else predict_fn(x)
        p = p if (hs, ws) == (h, w) else resize(p, (h, w), mode="bilinear")
        acc = p if acc is None else acc + p
    return acc / len(scales)
