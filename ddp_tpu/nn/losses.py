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


def _phase_taps(scale: int, align_corners: bool):
    """Per-phase (shift, w_lo, w_hi) of an integer-scale bilinear upsample.

    Output pixel o = scale*i + p samples src = (o+0.5)/scale - 0.5
    = i + (p + 0.5)/scale - 0.5 (torch align_corners=False), i.e. a fixed
    fractional offset per phase: tap pair (i-1, i) when the offset is
    negative, (i, i+1) when positive — both expressible as edge-clamped
    static shifts of the latent grid, no gather.
    """
    assert not align_corners, "fused path covers the align_corners=False default"
    taps = []
    for p in range(scale):
        phi = (p + 0.5) / scale - 0.5
        if phi < 0:
            taps.append((-1, -phi, 1.0 + phi))  # lo = i-1, hi = i
        else:
            taps.append((+1, 1.0 - phi, phi))  # lo = i, hi = i+1
    return taps


def _shift_edge(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """x shifted by d along axis with edge-replicate padding (static slices)."""
    if d == 0:
        return x
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    if d < 0:  # neighbor at i-1: prepend edge row, drop last
        idx[axis] = slice(0, n + d)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (-d, 0)
    else:  # neighbor at i+1
        idx[axis] = slice(d, n)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, d)
    return jnp.pad(x[tuple(idx)], pad, mode="edge")


def cross_entropy_seg_upsampled(
    logits: jnp.ndarray,  # [B, h, w, K] latent-grid logits
    labels: jnp.ndarray,  # [B, s*h, s*w] int full-res labels
    scale: int,
    ignore_index: int = 255,
    align_corners: bool = False,
    with_acc: bool = False,
):
    """CE of bilinear-upsampled logits WITHOUT materializing the full-res
    logits tensor — the flagship train step's single biggest cost
    (train_profile_notes.md: the 512²x150 f32 upsample+CE is ~20% of the
    step, pure HBM traffic; 630 MB per head per direction).

    Equivalent by phase decomposition: an integer-scale bilinear upsample
    is, per output phase (p, q), a fixed 2x2-tap lerp of edge-clamped
    SHIFTED copies of the latent grid — static slices the TPU prefers over
    the resize gathers. Each of the scale² phases computes its CE against
    the strided label slice labels[:, p::s, q::s] at latent resolution and
    the partial sums combine exactly (same nll sum, same denominator).
    Matches resize(...)+cross_entropy_seg to float tolerance incl. grads
    (tests/test_losses_upsampled.py).

    Returns loss, or (loss, acc) when with_acc (acc = full-res pixel
    accuracy, argmax per phase, no materialization either).
    """
    b, h, w, k = logits.shape
    taps = _phase_taps(scale, align_corners)

    # jax.checkpoint: without it AD saves every phase's interpolated logits
    # for the log-softmax backward — the same ~B*(s*h)*(s*w)*K f32 bytes the
    # phase decomposition removed from the forward (measured: fused CE
    # without remat bought only +1.5% step time). Recomputing the lerps in
    # the backward is near-free; only the latent-res logits are saved.
    @jax.checkpoint
    def phases(logits):
        nll_sum = jnp.zeros((), jnp.float32)
        correct = jnp.zeros((), jnp.float32)
        valid_count = jnp.zeros((), jnp.float32)
        # compute in the INPUT dtype: under the bf16 train policy the
        # decoder logits arrive bf16 and the CE region is pure HBM
        # bandwidth (measured 47 ms/step at b4/512² in f32 phases) — bf16
        # halves it; all reductions still accumulate in f32
        lg = logits
        # hoist the row shifted copies: phases share {-1, 0, +1} neighbors
        rows = {d: _shift_edge(lg, d, 1) for d in (-1, 0, 1)}
        for p, (dy, wy_lo, wy_hi) in enumerate(taps):
            # vertical lerp for this row phase: [B, h, w, K]
            zy = (rows[dy] * wy_lo + rows[0] * wy_hi if dy < 0
                  else rows[0] * wy_lo + rows[dy] * wy_hi)
            for q, (dx, wx_lo, wx_hi) in enumerate(taps):
                zx_n = _shift_edge(zy, dx, 2)
                z = (zx_n * wx_lo + zy * wx_hi if dx < 0
                     else zy * wx_lo + zx_n * wx_hi)
                lab = labels[:, p::scale, q::scale]
                valid = lab != ignore_index
                safe = jnp.where(valid, lab, 0)
                logp = jax.nn.log_softmax(z, axis=-1)
                # gather-free label pick: take_along_axis lowers to a 65k-row
                # gather per phase (the same op class that made the resize
                # path slow); a one-hot contraction stays on the VPU/MXU
                onehot = (safe[..., None] ==
                          jnp.arange(k, dtype=safe.dtype)).astype(logp.dtype)
                nll = -(logp * onehot).sum(axis=-1)
                # cast BEFORE the spatial sum: a bf16 accumulator over 16k
                # values loses ~2 digits
                nll_sum = nll_sum + jnp.where(valid, nll, 0.0).astype(
                    jnp.float32).sum()
                if with_acc:
                    pred = jnp.argmax(z, axis=-1)
                    correct = correct + jnp.where(
                        valid, pred == safe, False).sum().astype(jnp.float32)
                    valid_count = valid_count + valid.sum().astype(jnp.float32)
        return nll_sum, correct, valid_count

    nll_sum, correct, valid_count = phases(logits)
    loss = nll_sum / labels.size
    if with_acc:
        return loss, correct / jnp.maximum(valid_count, 1.0)
    return loss


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


# ---------------------------------------------------------------------------
# Region losses (mmseg dice/tversky/lovasz family), TPU-first: every op is
# static-shape — the reference's dynamic ignore-index filtering (boolean
# indexing) is replaced by masking / sort-to-back tricks.
# ---------------------------------------------------------------------------


def _one_hot_valid(labels: jnp.ndarray, num_classes: int, ignore_index: int):
    """(one_hot [.., K], valid [..]) with ignored pixels all-zero."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    oh = jax.nn.one_hot(safe, num_classes, dtype=jnp.float32)
    return oh * valid[..., None], valid


def dice_loss(
    logits: jnp.ndarray,  # [B, H, W, K]
    labels: jnp.ndarray,  # [B, H, W]
    smooth: float = 1.0,
    exponent: float = 2.0,
    class_weight: Optional[jnp.ndarray] = None,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Multi-class dice (mmseg DiceLoss semantics: softmax probs, per-class
    binary dice over flattened pixels, mean over classes then batch —
    segmentation/mmseg/models/losses/dice_loss.py:13-47)."""
    k = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    oh, valid = _one_hot_valid(labels, k, ignore_index)
    p = probs.reshape(probs.shape[0], -1, k)
    t = oh.reshape(oh.shape[0], -1, k)
    m = valid.reshape(valid.shape[0], -1, 1).astype(p.dtype)
    num = 2.0 * jnp.sum(p * t * m, axis=1) + smooth  # [B, K]
    den = jnp.sum(p**exponent + t**exponent, axis=1) + smooth
    per_class = 1.0 - num / den  # [B, K]
    if class_weight is not None:
        per_class = per_class * class_weight[None, :]
    return per_class.mean()


def tversky_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 0.3,
    beta: float = 0.7,
    smooth: float = 1.0,
    class_weight: Optional[jnp.ndarray] = None,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Tversky loss (mmseg tversky_loss.py:14-58): generalizes dice with
    separate FP (alpha) / FN (beta) weights."""
    k = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    oh, valid = _one_hot_valid(labels, k, ignore_index)
    p = probs.reshape(probs.shape[0], -1, k)
    t = oh.reshape(oh.shape[0], -1, k)
    m = valid.reshape(valid.shape[0], -1, 1).astype(p.dtype)
    tp = jnp.sum(p * t * m, axis=1)
    fp = jnp.sum(p * (1.0 - t) * m, axis=1)
    fn = jnp.sum((1.0 - p) * t * m, axis=1)
    per_class = 1.0 - (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    if class_weight is not None:
        per_class = per_class * class_weight[None, :]
    return per_class.mean()


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors
    (lovasz_loss.py:15-27)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    logits: jnp.ndarray,  # [B, H, W, K]
    labels: jnp.ndarray,  # [B, H, W]
    classes: str = "present",
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Multi-class Lovasz-Softmax (mmseg lovasz_loss.py:129-224,
    per_image=False default). TPU-first: instead of dynamically dropping
    ignored pixels, their errors are forced to 0 so they sort to the back and
    contribute 0 to the dot product (ties at error=0 are measure-zero)."""
    k = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1).reshape(-1, k)
    flat = labels.reshape(-1)
    valid = flat != ignore_index
    safe = jnp.where(valid, flat, 0)

    def per_class(c):
        fg = ((safe == c) & valid).astype(probs.dtype)
        err = jnp.abs(fg - probs[:, c])
        err = jnp.where(valid, err, 0.0)
        err_sorted, fg_sorted = jax.lax.sort_key_val(-err, fg)
        grad = _lovasz_grad(fg_sorted)
        loss_c = jnp.dot(-err_sorted, grad)
        present = fg.sum() > 0
        return loss_c, present

    losses, presents = jax.vmap(per_class)(jnp.arange(k))
    if classes == "present":
        w = presents.astype(losses.dtype)
        return (losses * w).sum() / jnp.maximum(w.sum(), 1.0)
    return losses.mean()


def lovasz_hinge(
    logits: jnp.ndarray,  # [B, H, W] binary logits
    labels: jnp.ndarray,  # [B, H, W] in {0, 1}
    ignore_index: int = 255,
    per_image: bool = True,
) -> jnp.ndarray:
    """Binary Lovasz hinge (lovasz_loss.py:60-126; per_image=True default)."""

    def one(logit, label):
        flat = logit.reshape(-1)
        lab = label.reshape(-1)
        valid = lab != ignore_index
        signs = 2.0 * lab.astype(flat.dtype) - 1.0
        err = 1.0 - flat * signs
        err = jnp.where(valid, err, -1e9)
        err_sorted, lab_sorted = jax.lax.sort_key_val(-err, lab.astype(flat.dtype))
        lab_sorted = jnp.where(-err_sorted > -1e8, lab_sorted, 0.0)
        grad = _lovasz_grad(lab_sorted)
        return jnp.dot(jax.nn.relu(-err_sorted), grad)

    if per_image:
        return jax.vmap(one)(logits, labels).mean()
    return one(logits, labels)


def focal_seg_loss(
    logits: jnp.ndarray,  # [B, H, W, K]
    labels: jnp.ndarray,  # [B, H, W]
    gamma: float = 2.0,
    alpha: float = 0.5,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """mmseg FocalLoss (sigmoid variant, one-hot targets over K classes,
    mean over valid pixels — mmseg/models/losses/focal_loss.py)."""
    k = logits.shape[-1]
    oh, valid = _one_hot_valid(labels, k, ignore_index)
    per_el = sigmoid_focal_loss(logits, oh, alpha=alpha, gamma=gamma)
    per_el = per_el * valid[..., None]
    return per_el.sum() / jnp.maximum(valid.sum() * 1.0, 1.0)


# ---------------------------------------------------------------------------
# Depth losses beyond SigLoss (depth/depth/models/losses/)
# ---------------------------------------------------------------------------


def bins_chamfer_loss(
    bin_edges: jnp.ndarray,  # [B, N+1] adabins bin edges
    gt_depth: jnp.ndarray,  # [B, H, W] (<=1e-3 invalid)
    min_valid: float = 1e-3,
) -> jnp.ndarray:
    """Bidirectional chamfer between bin centers and valid GT depth values
    (depth/depth/models/losses/chamferloss.py:27-39, AdaBins). TPU-first:
    the reference pads a ragged list of valid pixels; here invalid pixels are
    masked out of both directions with static shapes."""
    centers = 0.5 * (bin_edges[:, 1:] + bin_edges[:, :-1])  # [B, N]
    target = gt_depth.reshape(gt_depth.shape[0], -1)  # [B, M]
    mask = target > min_valid
    # pairwise |c - t|^2: [B, N, M]
    d2 = (centers[:, :, None] - target[:, None, :]) ** 2
    big = jnp.asarray(1e12, d2.dtype)
    d2_masked = jnp.where(mask[:, None, :], d2, big)
    # bins -> nearest valid gt
    loss_x = jnp.min(d2_masked, axis=2).mean(axis=1)  # [B]
    # valid gt -> nearest bin
    near_t = jnp.min(d2, axis=1)  # [B, M]
    denom = jnp.maximum(mask.sum(axis=1), 1)
    loss_y = jnp.where(mask, near_t, 0.0).sum(axis=1) / denom
    has_valid = (mask.sum(axis=1) > 0).astype(loss_x.dtype)
    return ((loss_x + loss_y) * has_valid).mean()


def mse_depth_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                   valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked MSE (depth/depth/models/losses/mseloss.py)."""
    if valid_mask is None:
        valid_mask = gt > 0
    se = jnp.where(valid_mask, (pred - gt) ** 2, 0.0)
    return se.sum() / jnp.maximum(valid_mask.sum(), 1)


def ce_bins_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain CE over bin classes (depth/depth/models/losses/celoss.py:38-46,
    used by BinsFormer's auxiliary classification)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return nll.mean()
