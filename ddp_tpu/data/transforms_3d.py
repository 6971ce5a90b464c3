"""BEV 3D train-time augmentations — host-side numpy (SURVEY.md §2.5).

Parity targets (bev/mmdet3d/datasets/pipelines/transforms_3d.py, loading.py):
  - ImageAug3D (:26-122): per-camera resize/crop/flip/rotate with the
    post-homography folded into (post_rot, post_tran) so the LSS frustum
    unprojection stays consistent.
  - GlobalRotScaleTrans (:124-157): scene-level rot/scale/translate of the
    lidar frame; returns the 4x4 lidar_aug_matrix.
  - GridMask (:159-245): structured grid dropout on the camera images with
    epoch-scheduled probability.
  - LoadPointsFromMultiSweeps (loading.py:84-230): aggregate N past sweeps
    into the keyframe lidar frame with a time-lag channel; remove_close.

All functions are pure numpy with an explicit np.random.Generator — no
global RNG (deterministic per (seed, epoch, idx) like the other pipelines).
Images are float32 [H, W, 3]; channel-wise PIL 'F' images handle the
subpixel resize/rotate the reference gets from PIL RGB ops.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _pil_resize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    chans = [np.asarray(Image.fromarray(img[..., c], mode="F")
                        .resize(size_wh, Image.BILINEAR))
             for c in range(img.shape[-1])]
    return np.stack(chans, axis=-1)


def _pil_rotate(img: np.ndarray, deg: float) -> np.ndarray:
    from PIL import Image

    if deg == 0:
        return img
    chans = [np.asarray(Image.fromarray(img[..., c], mode="F").rotate(deg))
             for c in range(img.shape[-1])]
    return np.stack(chans, axis=-1)


@dataclasses.dataclass(frozen=True)
class ImageAug3DConfig:
    """nuScenes seg defaults (bev/configs/nuscenes/default.yaml image aug)."""

    final_dim: Tuple[int, int] = (256, 704)
    resize_lim: Tuple[float, float] = (0.38, 0.55)
    bot_pct_lim: Tuple[float, float] = (0.0, 0.0)
    rot_lim: Tuple[float, float] = (-5.4, 5.4)
    rand_flip: bool = True


def sample_image_aug(rng: np.random.Generator, ori_wh: Tuple[int, int],
                     cfg: ImageAug3DConfig, is_train: bool):
    """Draw (resize, resize_dims, crop, flip, rotate) — ImageAug3D
    .sample_augmentation (:37-60)."""
    w, h = ori_wh
    fh, fw = cfg.final_dim
    if is_train:
        resize = float(rng.uniform(*cfg.resize_lim))
        neww, newh = int(w * resize), int(h * resize)
        crop_h = int((1 - rng.uniform(*cfg.bot_pct_lim)) * newh) - fh
        crop_w = int(rng.uniform(0, max(0, neww - fw)))
        flip = bool(cfg.rand_flip and rng.integers(0, 2))
        rotate = float(rng.uniform(*cfg.rot_lim))
    else:
        resize = float(np.mean(cfg.resize_lim))
        neww, newh = int(w * resize), int(h * resize)
        crop_h = int((1 - np.mean(cfg.bot_pct_lim)) * newh) - fh
        crop_w = int(max(0, neww - fw) / 2)
        flip, rotate = False, 0.0
    crop = (crop_w, crop_h, crop_w + fw, crop_h + fh)
    return resize, (neww, newh), crop, flip, rotate


def image_aug_3d(
    imgs: np.ndarray,  # [N, H, W, 3] float32
    post_rots: np.ndarray,  # [N, 3, 3]
    post_trans: np.ndarray,  # [N, 3]
    rng: np.random.Generator,
    cfg: ImageAug3DConfig,
    is_train: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-camera resize/crop/flip/rotate, composing the pixel homography
    into (post_rot, post_tran) exactly as ImageAug3D.img_transform (:62-92)
    so `get_geometry` can undo it.

    Returns (new_imgs [N, fh, fw, 3], post_rots, post_trans).
    """
    n, h, w, _ = imgs.shape
    fh, fw = cfg.final_dim
    out = np.zeros((n, fh, fw, imgs.shape[-1]), np.float32)
    new_rots = post_rots.copy()
    new_trans = post_trans.copy()
    for i in range(n):
        resize, resize_dims, crop, flip, rotate = sample_image_aug(
            rng, (w, h), cfg, is_train)
        img = _pil_resize(imgs[i], resize_dims)
        # crop with zero padding for out-of-bounds (PIL crop semantics)
        x0, y0, x1, y1 = crop
        canvas = np.zeros((y1 - y0, x1 - x0, img.shape[-1]), np.float32)
        sy0, sy1 = max(y0, 0), min(y1, img.shape[0])
        sx0, sx1 = max(x0, 0), min(x1, img.shape[1])
        if sy1 > sy0 and sx1 > sx0:
            canvas[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = img[sy0:sy1, sx0:sx1]
        img = canvas
        if flip:
            img = img[:, ::-1]
        img = _pil_rotate(img, rotate)
        out[i] = img

        rot = np.eye(2, dtype=np.float32) * resize
        tran = post_trans[i, :2] * 0.0  # start from identity post-transform
        rot = rot @ post_rots[i, :2, :2]
        tran = resize * post_trans[i, :2]
        tran = tran - np.asarray(crop[:2], np.float32)
        if flip:
            a = np.asarray([[-1, 0], [0, 1]], np.float32)
            b = np.asarray([crop[2] - crop[0], 0], np.float32)
            rot = a @ rot
            tran = a @ tran + b
        theta = rotate / 180.0 * np.pi
        a = np.asarray([[np.cos(theta), np.sin(theta)],
                        [-np.sin(theta), np.cos(theta)]], np.float32)
        b = np.asarray([crop[2] - crop[0], crop[3] - crop[1]], np.float32) / 2
        b = a @ (-b) + b
        rot = a @ rot
        tran = a @ tran + b
        new_rots[i] = np.eye(3, dtype=np.float32)
        new_rots[i][:2, :2] = rot
        new_trans[i] = np.asarray([tran[0], tran[1], 0.0], np.float32)
    return out, new_rots, new_trans


def global_rot_scale_trans(
    rng: np.random.Generator,
    points: Optional[np.ndarray] = None,  # [P, D] xyz + extras
    resize_lim: Tuple[float, float] = (0.9, 1.1),
    rot_lim: Tuple[float, float] = (-0.78539816, 0.78539816),
    trans_lim: float = 0.5,
    is_train: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Scene-level rotation/scale/translation (GlobalRotScaleTrans :124-157).

    Points are rotated by -theta then translated then scaled
    (p' = s·(R(−θ)p + t)), and the 4x4 ``lidar_aug_matrix`` satisfying
    p' = M[:3,:3]·p + M[:3,3] is returned so downstream camera→lidar
    geometry can be composed into the augmented frame.
    """
    transform = np.eye(4, dtype=np.float32)
    if not is_train:
        return points, transform
    scale = float(rng.uniform(*resize_lim))
    theta = float(rng.uniform(*rot_lim))
    translation = rng.normal(0, trans_lim, 3).astype(np.float32)
    c, s = np.cos(-theta), np.sin(-theta)
    rot = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    if points is not None:
        points = points.copy()
        points[:, :3] = points[:, :3] @ rot.T
        points[:, :3] += translation
        points[:, :3] *= scale
    transform[:3, :3] = rot * scale
    transform[:3, 3] = translation * scale
    return points, transform


def rotate_bev_masks(masks: np.ndarray, transform: np.ndarray,
                     scope: float) -> np.ndarray:
    """Resample BEV class masks under the same scene transform (nearest).

    masks: [G, G, K] with row = x index, col = y index (SyntheticBEVDataset
    layout); transform: the 4x4 lidar_aug_matrix. Output cell (i, j) samples
    the mask at the PRE-transform location of its center."""
    g = masks.shape[0]
    cell = 2 * scope / g
    centers = (np.arange(g) + 0.5) * cell - scope
    xx, yy = np.meshgrid(centers, centers, indexing="ij")
    pts = np.stack([xx, yy, np.zeros_like(xx), np.ones_like(xx)], -1)  # [G,G,4]
    inv = np.linalg.inv(transform)
    src = pts.reshape(-1, 4) @ inv.T
    si = np.clip(((src[:, 0] + scope) / cell).astype(np.int64), 0, g - 1)
    sj = np.clip(((src[:, 1] + scope) / cell).astype(np.int64), 0, g - 1)
    inb = ((np.abs(src[:, 0]) < scope) & (np.abs(src[:, 1]) < scope))
    out = masks[si, sj] * inb[:, None]
    return out.reshape(g, g, masks.shape[-1]).astype(masks.dtype)


def grid_mask(
    imgs: np.ndarray,  # [N, H, W, 3]
    rng: np.random.Generator,
    prob: float = 0.7,
    ratio: float = 0.5,
    rotate: int = 1,
    use_h: bool = True,
    use_w: bool = True,
    mode: int = 1,
) -> np.ndarray:
    """Structured grid dropout (GridMask :192-245). ``mode=1`` keeps the
    grid cells and drops the bars (the BEVFusion config's setting)."""
    if rng.random() > prob:
        return imgs
    n, h, w, _ = imgs.shape
    d = int(rng.integers(2, min(h, w)))
    length = min(max(int(d * ratio + 0.5), 1), d - 1) if ratio != 1 else \
        int(rng.integers(1, d))
    hh, ww = int(1.5 * h), int(1.5 * w)
    mask = np.ones((hh, ww), np.float32)
    st_h = int(rng.integers(d))
    st_w = int(rng.integers(d))
    if use_h:
        for i in range(hh // d):
            s = d * i + st_h
            mask[s:min(s + length, hh), :] = 0
    if use_w:
        for i in range(ww // d):
            s = d * i + st_w
            mask[:, s:min(s + length, ww)] = 0
    r = int(rng.integers(rotate)) if rotate > 1 else 0
    if r:
        mask = _pil_rotate(mask[..., None], r)[..., 0]
    mask = mask[(hh - h) // 2:(hh - h) // 2 + h,
                (ww - w) // 2:(ww - w) // 2 + w]
    if mode == 1:
        mask = 1.0 - mask
    return imgs * mask[None, :, :, None]


def multi_sweep_points(
    key_points: np.ndarray,  # [P, 5] x y z intensity time
    sweeps: Sequence[Dict[str, np.ndarray]],
    rng: np.random.Generator,
    sweeps_num: int = 10,
    timestamp: float = 0.0,
    remove_close: bool = True,
    close_radius: float = 1.0,
    test_mode: bool = False,
) -> np.ndarray:
    """Aggregate past sweeps into the keyframe lidar frame
    (LoadPointsFromMultiSweeps loading.py:84-230).

    Each sweep dict: {'points': [P,5], 'sensor2lidar_rotation': [3,3],
    'sensor2lidar_translation': [3], 'timestamp': float (s)}.
    The 5th channel becomes the time lag vs the keyframe.
    """
    key = key_points.copy()
    key[:, 4] = 0.0
    out: List[np.ndarray] = [key]
    if len(sweeps) == 0:
        for _ in range(sweeps_num):
            out.append(_remove_close(key, close_radius) if remove_close else key)
    else:
        if len(sweeps) <= sweeps_num:
            choices = np.arange(len(sweeps))
        elif test_mode:
            choices = np.arange(sweeps_num)
        else:
            choices = rng.choice(len(sweeps), sweeps_num, replace=False)
        for idx in choices:
            sw = sweeps[int(idx)]
            pts = sw["points"].copy()
            if remove_close:
                pts = _remove_close(pts, close_radius)
            pts[:, :3] = pts[:, :3] @ np.asarray(
                sw["sensor2lidar_rotation"], np.float32).T
            pts[:, :3] += np.asarray(sw["sensor2lidar_translation"], np.float32)
            pts[:, 4] = timestamp - float(sw["timestamp"])
            out.append(pts)
    return np.concatenate(out, axis=0)


def _remove_close(points: np.ndarray, radius: float = 1.0) -> np.ndarray:
    x = np.abs(points[:, 0]) < radius
    y = np.abs(points[:, 1]) < radius
    return points[~(x & y)]
