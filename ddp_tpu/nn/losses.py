"""Task losses.

Parity targets:
  - mmseg CrossEntropyLoss with ignore_index=255 and the historical
    avg_non_ignore=False averaging (loss summed over valid pixels / total
    pixel count) — segmentation/mmseg/models/losses/cross_entropy_loss.py.
  - mmseg accuracy (top-1 over valid pixels) for logging.
  - sigmoid focal loss (BEV per-class masks) — mmcv CUDA op re-done in jnp.
  - SigLoss (scale-invariant log, depth) — depth/depth/models/losses/sigloss.py:8.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_seg(
    logits: jnp.ndarray,  # [B, H, W, K]
    labels: jnp.ndarray,  # [B, H, W] int
    ignore_index: int = 255,
    class_weight: Optional[jnp.ndarray] = None,
    avg_non_ignore: bool = False,
) -> jnp.ndarray:
    """Pixel cross-entropy with ignore handling, mmseg-compatible averaging."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        nll = nll * class_weight[safe_labels]
    nll = jnp.where(valid, nll, 0.0)
    if avg_non_ignore:
        denom = jnp.maximum(valid.sum(), 1)
    else:
        denom = labels.size
    return nll.sum() / denom


def seg_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255):
    valid = labels != ignore_index
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.where(valid, pred == labels, False)
    return correct.sum() / jnp.maximum(valid.sum(), 1)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,  # same shape, {0,1}
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Per-element sigmoid focal loss (mmcv semantics), no reduction."""
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jax.nn.log_sigmoid(logits)
           + (1.0 - targets) * jax.nn.log_sigmoid(-logits))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return alpha_t * ((1.0 - p_t) ** gamma) * ce


def sig_loss(
    pred_depth: jnp.ndarray,  # [B, H, W] metric depth > 0
    gt_depth: jnp.ndarray,  # [B, H, W], <= 0 means invalid
    valid_mask: Optional[jnp.ndarray] = None,
    lam: float = 0.85,  # 'sigma' variance weight (reference uses 0.85 -> sqrt form)
    eps: float = 1e-3,  # added inside log for warm-up stability (sigloss.py)
) -> jnp.ndarray:
    """Scale-invariant log loss: sqrt(E[g²] − λ·E[g]²), g = log(pred) − log(gt).

    Matches depth/depth/models/losses/sigloss.py:41-53 ('SigLoss' with
    valid_mask = gt > 0).
    """
    if valid_mask is None:
        valid_mask = gt_depth > 0
    n = jnp.maximum(valid_mask.sum(), 1)
    g = jnp.log(pred_depth + eps) - jnp.log(jnp.where(valid_mask, gt_depth, 1.0) + eps)
    g = jnp.where(valid_mask, g, 0.0)
    dg = (g ** 2).sum() / n - lam * (g.sum() / n) ** 2
    return jnp.sqrt(jnp.maximum(dg, 1e-12))
