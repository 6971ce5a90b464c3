"""Evaluation metrics.

Parity targets:
  - seg: ``intersect_and_union`` / ``pre_eval_to_metrics`` mIoU/mDice/mFscore,
    aAcc/mAcc (segmentation/mmseg/core/evaluation/metrics.py:26,257,297).
  - depth: the 9 standard metrics a1/a2/a3, abs_rel, sq_rel, rmse, rmse_log,
    log10, silog (depth/depth/core/evaluation/metrics.py:12-44).
  - BEV: IoU over thresholds [0.35..0.65], per-class max
    (bev/mmdet3d/datasets/nuscenes_dataset.py:492-524).

All accumulate as plain numpy/jnp histograms so multi-host eval reduces with a
single allgather/psum of four [K] vectors per image batch.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def intersect_and_union(
    pred: np.ndarray, label: np.ndarray, num_classes: int, ignore_index: int = 255
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-class (intersection, union, pred-area, label-area) histograms."""
    mask = label != ignore_index
    pred = pred[mask]
    label = label[mask]
    inter = pred[pred == label]
    area_inter = np.bincount(inter, minlength=num_classes)[:num_classes]
    area_pred = np.bincount(pred, minlength=num_classes)[:num_classes]
    area_label = np.bincount(label, minlength=num_classes)[:num_classes]
    area_union = area_pred + area_label - area_inter
    return area_inter, area_union, area_pred, area_label


class SegMetricAccumulator:
    """Streaming mIoU/aAcc/mAcc accumulator (reference pre_eval pattern)."""

    def __init__(self, num_classes: int, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.inter = np.zeros(num_classes, np.int64)
        self.union = np.zeros(num_classes, np.int64)
        self.pred = np.zeros(num_classes, np.int64)
        self.label = np.zeros(num_classes, np.int64)

    def update(self, pred: np.ndarray, label: np.ndarray):
        i, u, p, l = intersect_and_union(
            np.asarray(pred), np.asarray(label), self.num_classes, self.ignore_index
        )
        self.inter += i
        self.union += u
        self.pred += p
        self.label += l

    def compute(self) -> Dict[str, float]:
        eps = 1e-12
        iou = self.inter / np.maximum(self.union, 1)
        acc = self.inter / np.maximum(self.label, 1)
        present = self.label > 0
        return {
            "aAcc": float(self.inter.sum() / max(self.label.sum(), 1)),
            "mIoU": float(iou[present].mean()) if present.any() else 0.0,
            "mAcc": float(acc[present].mean()) if present.any() else 0.0,
            "IoU_per_class": iou,
        }


def depth_metrics(pred: np.ndarray, gt: np.ndarray, mask: Optional[np.ndarray] = None
                  ) -> Dict[str, float]:
    """The 9 depth metrics over valid pixels (gt > 0 ∧ mask)."""
    valid = gt > 0
    if mask is not None:
        valid &= mask
    p = pred[valid].astype(np.float64)
    g = gt[valid].astype(np.float64)
    thresh = np.maximum(g / p, p / g)
    err = p - g
    log_err = np.log(p) - np.log(g)
    return {
        "a1": float((thresh < 1.25).mean()),
        "a2": float((thresh < 1.25 ** 2).mean()),
        "a3": float((thresh < 1.25 ** 3).mean()),
        "abs_rel": float((np.abs(err) / g).mean()),
        "sq_rel": float((err ** 2 / g).mean()),
        "rmse": float(np.sqrt((err ** 2).mean())),
        "rmse_log": float(np.sqrt((log_err ** 2).mean())),
        "log10": float(np.abs(np.log10(p) - np.log10(g)).mean()),
        "silog": float(np.sqrt((log_err ** 2).mean() - log_err.mean() ** 2) * 100.0),
    }


def bev_map_iou(
    pred_scores: np.ndarray,  # [N, K, H, W] sigmoid scores
    gt_masks: np.ndarray,  # [N, K, H, W] binary
    thresholds=(0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65),
) -> Dict[str, float]:
    """nuScenes BEV map IoU: per class, max IoU across score thresholds."""
    k = pred_scores.shape[1]
    per_class = np.zeros((len(thresholds), k))
    for ti, t in enumerate(thresholds):
        p = pred_scores >= t
        inter = (p & (gt_masks > 0.5)).sum(axis=(0, 2, 3))
        union = (p | (gt_masks > 0.5)).sum(axis=(0, 2, 3))
        per_class[ti] = inter / np.maximum(union, 1)
    best = per_class.max(axis=0)
    out = {f"iou_class{i}": float(best[i]) for i in range(k)}
    out["mIoU"] = float(best.mean())
    return out
