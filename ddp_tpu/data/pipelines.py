"""Train/val data pipeline transforms — numpy host-side, mmseg-compatible.

Parity targets (segmentation/mmseg/datasets/pipelines/transforms.py):
  - Resize with img_scale + ratio_range (keep_ratio): scale sampled per image
  - RandomCrop with cat_max_ratio (re-crop up to 10x to avoid one class
    dominating), ignore label excluded from the count
  - RandomFlip (horizontal, prob 0.5)
  - PhotoMetricDistortion (brightness/contrast/saturation/hue jitter)
  - Normalize (mean/std, RGB), Pad to crop size with pad_val 0 / seg 255

All transforms take and return a dict sample {'image': HxWx3 float32,
'label': HxW int32} and use an explicit np.random.Generator — deterministic
per-sample seeding, no global RNG state (replaces torch worker seeding).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

Sample = Dict[str, np.ndarray]


def _pil_resize(arr: np.ndarray, size_wh: Tuple[int, int], nearest: bool) -> np.ndarray:
    from PIL import Image

    if arr.ndim == 3:
        im = Image.fromarray(arr.astype(np.uint8))
        return np.asarray(im.resize(size_wh, Image.NEAREST if nearest else Image.BILINEAR))
    im = Image.fromarray(arr.astype(np.int32), mode="I")
    return np.asarray(im.resize(size_wh, Image.NEAREST))


def random_resize(
    sample: Sample, rng: np.random.Generator,
    img_scale: Tuple[int, int], ratio_range: Tuple[float, float] = (0.5, 2.0),
) -> Sample:
    """mmseg Resize(keep_ratio=True, ratio_range): sample ratio, scale the
    long-side target, then fit within (keeping aspect)."""
    ratio = rng.uniform(*ratio_range)
    scale = (int(img_scale[0] * ratio), int(img_scale[1] * ratio))
    h, w = sample["image"].shape[:2]
    max_long, max_short = max(scale), min(scale)
    scale_factor = min(max_long / max(h, w), max_short / min(h, w))
    new_w, new_h = int(w * scale_factor + 0.5), int(h * scale_factor + 0.5)
    out = dict(sample)
    out["image"] = _pil_resize(sample["image"], (new_w, new_h), nearest=False).astype(np.float32)
    if "label" in sample:
        out["label"] = _pil_resize(sample["label"], (new_w, new_h), nearest=True).astype(np.int32)
    return out


def random_crop(
    sample: Sample, rng: np.random.Generator, crop: Tuple[int, int],
    cat_max_ratio: float = 0.75, ignore_index: int = 255, max_attempts: int = 10,
) -> Sample:
    img, label = sample["image"], sample.get("label")
    h, w = img.shape[:2]
    ch, cw = min(crop[0], h), min(crop[1], w)

    def rand_box():
        y = rng.integers(0, h - ch + 1)
        x = rng.integers(0, w - cw + 1)
        return y, x

    y, x = rand_box()
    if label is not None and cat_max_ratio < 1.0:
        for _ in range(max_attempts):
            patch = label[y:y + ch, x:x + cw]
            counts = np.bincount(patch.reshape(-1))
            counts = counts[:ignore_index] if len(counts) > ignore_index else counts
            total = counts.sum()
            if total > 0 and counts.max() / total < cat_max_ratio:
                break
            y, x = rand_box()
    out = dict(sample)
    out["image"] = img[y:y + ch, x:x + cw]
    if label is not None:
        out["label"] = label[y:y + ch, x:x + cw]
    return out


def random_flip(sample: Sample, rng: np.random.Generator, prob: float = 0.5) -> Sample:
    if rng.random() >= prob:
        return sample
    out = dict(sample)
    out["image"] = sample["image"][:, ::-1].copy()
    if "label" in sample:
        out["label"] = sample["label"][:, ::-1].copy()
    return out


def photo_metric_distortion(
    sample: Sample, rng: np.random.Generator,
    brightness_delta: float = 32, contrast_range=(0.5, 1.5),
    saturation_range=(0.5, 1.5), hue_delta: float = 18,
) -> Sample:
    """mmseg PhotoMetricDistortion: random brightness, contrast (random
    order), saturation, hue — in float32, clipped to [0, 255]."""
    img = sample["image"].astype(np.float32)

    def clip(x):
        return np.clip(x, 0, 255)

    if rng.integers(2):
        img = clip(img + rng.uniform(-brightness_delta, brightness_delta))
    contrast_first = rng.integers(2)
    if contrast_first and rng.integers(2):
        img = clip(img * rng.uniform(*contrast_range))
    # saturation / hue via HSV
    if rng.integers(2) or rng.integers(2):
        hsv = _rgb_to_hsv(img)
        if rng.integers(2):
            hsv[..., 1] = np.clip(hsv[..., 1] * rng.uniform(*saturation_range), 0, 1)
        if rng.integers(2):
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta) / 360.0) % 1.0
        img = clip(_hsv_to_rgb(hsv))
    if not contrast_first and rng.integers(2):
        img = clip(img * rng.uniform(*contrast_range))
    out = dict(sample)
    out["image"] = img
    return out


def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    x = img / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn + 1e-12
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = np.zeros_like(mx)
    m = mx == r
    h[m] = ((g - b)[m] / diff[m]) % 6
    m = mx == g
    h[m] = (b - r)[m] / diff[m] + 2
    m = mx == b
    h[m] = (r - g)[m] / diff[m] + 4
    h = h / 6.0
    s = np.where(mx > 0, diff / (mx + 1e-12), 0.0)
    return np.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h).astype(np.int32) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    lut = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1), np.stack([p, v, t], -1),
        np.stack([p, q, v], -1), np.stack([t, p, v], -1), np.stack([v, p, q], -1),
    ], axis=-2)
    rgb = np.take_along_axis(lut, i[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    return rgb * 255.0


def normalize(sample: Sample, mean: Sequence[float], std: Sequence[float]) -> Sample:
    out = dict(sample)
    out["image"] = (sample["image"].astype(np.float32) - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    return out


def pad_to(sample: Sample, size: Tuple[int, int], seg_pad_val: int = 255) -> Sample:
    h, w = sample["image"].shape[:2]
    ph, pw = max(size[0] - h, 0), max(size[1] - w, 0)
    if ph == 0 and pw == 0:
        return sample
    out = dict(sample)
    out["image"] = np.pad(sample["image"], ((0, ph), (0, pw), (0, 0)))
    if "label" in sample:
        out["label"] = np.pad(sample["label"], ((0, ph), (0, pw)),
                              constant_values=seg_pad_val)
    return out


def seg_train_pipeline(
    sample: Sample, rng: np.random.Generator, crop: Tuple[int, int],
    img_scale: Tuple[int, int], ratio_range=(0.5, 2.0), cat_max_ratio=0.75,
    flip_prob=0.5, mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
) -> Sample:
    """The full DDP seg train pipeline (configs/_base_/datasets/ade20k.py:7-21):
    Resize(ratio_range) → RandomCrop(cat_max_ratio) → Flip → PhotoMetric →
    Normalize → Pad."""
    s = random_resize(sample, rng, img_scale, ratio_range)
    s = random_crop(s, rng, crop, cat_max_ratio)
    s = random_flip(s, rng, flip_prob)
    s = photo_metric_distortion(s, rng)
    s = normalize(s, mean, std)
    s = pad_to(s, crop)
    return s
