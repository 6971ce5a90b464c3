"""Depth datasets: NYUv2, KITTI (Eigen split), SUNRGBD, Cityscapes-depth,
and a synthetic generator — the reference depth toolbox's full dataset
surface (depth/depth/datasets/{nyu,kitti,sunrgbd,cityscapes}.py).

Parity targets:
  - nyu.py: depth PNGs scaled by 1000, eval on the Eigen center crop
    [45:471, 41:601].
  - kitti.py: depth scaled by 256, KB crop (352x1216 bottom-center,
    kitti.py:227-235), garg eval crop (kitti.py:53-54,238+).
  - sunrgbd.py: uint16 depth PNGs stored bit-rotated by 3
    (sunrgbd.py:225-229: (v >> 3) | (v << 13)), /1000 to meters, clipped
    at 8 m; Eigen-crop eval mask (sunrgbd.py eval_mask).
  - cityscapes.py: disparity PNGs, disparity = (raw - 1)/256 where raw > 0
    (cityscapes.py:246-250), depth = baseline * fx / disparity from the
    per-image camera JSON; garg-crop eval, max_depth 80.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def nyu_eval_mask(shape: Tuple[int, int]) -> np.ndarray:
    """Eigen crop used by the toolbox for NYU eval."""
    m = np.zeros(shape, bool)
    m[45:471, 41:601] = True
    return m


def garg_crop_mask(shape: Tuple[int, int]) -> np.ndarray:
    """Garg crop (Adabins convention) for KITTI eval."""
    h, w = shape
    m = np.zeros(shape, bool)
    m[int(0.40810811 * h):int(0.99189189 * h),
      int(0.03594771 * w):int(0.96405229 * w)] = True
    return m


def kb_crop(img: np.ndarray, depth: Optional[np.ndarray] = None):
    """KITTI benchmark crop: 352x1216 from the bottom, horizontally centered."""
    h, w = img.shape[:2]
    top = h - 352
    left = (w - 1216) // 2
    img = img[top:top + 352, left:left + 1216]
    if depth is not None:
        depth = depth[top:top + 352, left:left + 1216]
    return img, depth


def sunrgbd_decode_depth(raw: np.ndarray) -> np.ndarray:
    """SUNRGBD depth PNGs store millimeters bit-rotated left by 3 in uint16;
    undo with a 3-bit right-rotate then /1000 (sunrgbd.py:225-229), clip at
    the dataset's 8 m ceiling."""
    v = raw.astype(np.uint16)
    mm = np.bitwise_or(np.right_shift(v, 3), np.left_shift(v, 13))
    depth = mm.astype(np.float32) / 1000.0
    return np.minimum(depth, 8.0)


def cityscapes_disparity_to_depth(raw: np.ndarray, baseline: float,
                                  fx: float) -> np.ndarray:
    """Cityscapes precomputed disparity maps: disparity = (raw - 1)/256
    where raw > 0 (0 marks invalid), depth = baseline * fx / disparity
    (cityscapes.py:242-250). Invalid pixels return 0 (masked by eval)."""
    disp = (raw.astype(np.float32) - 1.0) / 256.0
    valid = raw > 0
    disp = np.where(valid & (disp > 0), disp, 1.0)
    depth = baseline * fx / disp
    return np.where(valid, depth, 0.0).astype(np.float32)


class DepthDataset:
    """File-list dataset for the toolbox's four layouts, following its split
    files: ``<root>/<dataset>_<split>.txt`` with space-separated
    ``image depth`` paths (nyu/kitti/sunrgbd) or ``image disparity camera``
    (cityscapes, third field = per-image camera JSON with fx + baseline)."""

    def __init__(self, data_root: str, split: str = "train", dataset: str = "nyu"):
        self.dataset = dataset
        self.data_root = data_root
        self.split = split
        self.depth_scale = 1000.0 if dataset in ("nyu", "sunrgbd") else 256.0
        self.items = self._index()

    def _index(self) -> List[Tuple[str, ...]]:
        r = self.data_root
        pairs = []
        split_file = os.path.join(r, f"{self.dataset}_{self.split}.txt")
        if os.path.exists(split_file):
            for line in open(split_file):
                parts = line.split()
                if len(parts) >= 2 and parts[1] != "None":
                    pairs.append(tuple(
                        os.path.join(r, p.lstrip("/\\")) for p in parts))
        return pairs

    def __len__(self):
        return len(self.items)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        import json as _json

        from PIL import Image

        item = self.items[idx]
        img_path, dep_path = item[0], item[1]
        img = np.asarray(Image.open(img_path).convert("RGB"), np.float32)
        raw = np.asarray(Image.open(dep_path))
        if self.dataset == "sunrgbd":
            depth = sunrgbd_decode_depth(raw)
        elif self.dataset == "cityscapes":
            with open(item[2]) as f:
                cam = _json.load(f)
            depth = cityscapes_disparity_to_depth(
                raw, cam["extrinsic"]["baseline"], cam["intrinsic"]["fx"])
        else:
            depth = raw.astype(np.float32) / self.depth_scale
        if self.dataset == "kitti":
            img, depth = kb_crop(img, depth)
        return {"image": img, "label": depth.astype(np.float32)}


class SyntheticDepthDataset:
    """Procedural depth data: depth is a smooth closed-form function of image
    content so a model can learn it."""

    def __init__(self, size: Tuple[int, int] = (64, 64), length: int = 256,
                 max_depth: float = 10.0):
        self.size = size
        self.length = length
        self.max_depth = max_depth

    def __len__(self):
        return self.length

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(idx)
        h, w = self.size
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        fx, fy = rng.uniform(0.5, 2.0, 2)
        phase = rng.uniform(0, 2 * np.pi)
        field = 0.5 + 0.4 * np.sin(2 * np.pi * fx * xx / w + phase) \
            * np.cos(2 * np.pi * fy * yy / h)
        depth = (0.1 + field * 0.9) * self.max_depth * 0.9
        img = np.stack([field, np.roll(field, 3, 0), np.roll(field, 3, 1)],
                       axis=-1).astype(np.float32) * 200.0 + 20.0
        img += rng.normal(0, 2.0, img.shape)
        return {"image": img.astype(np.float32), "label": depth.astype(np.float32)}


def depth_batch_iterator(ds, batch_size: int, crop: Tuple[int, int], seed: int = 0,
                         train: bool = True,
                         mean=(123.675, 116.28, 103.53),
                         std=(58.395, 57.12, 57.375),
                         rank: int = 0, world: int = 1):
    """Depth train iterator: random crop + flip + normalize (the toolbox's
    NYU pipeline: RandomRotate/Crop/Flip/ColorAug — rotation omitted, noted
    as a fidelity gap). ``batch_size`` is GLOBAL; with world > 1 each process
    yields its rank's slice (see seg_batch_iterator)."""
    from .pipelines import normalize, pad_to, random_flip

    assert batch_size % world == 0
    local = batch_size // world

    def make_batch(epoch, start):
        order = np.random.default_rng(seed + epoch).permutation(len(ds))
        imgs, deps = [], []
        for i in range(rank * local, (rank + 1) * local):
            idx = int(order[(start + i) % len(ds)])
            s = ds.load(idx)
            rng = np.random.default_rng((seed, epoch, idx))
            h, w = s["image"].shape[:2]
            ch, cw = min(crop[0], h), min(crop[1], w)
            if train:
                y = rng.integers(0, h - ch + 1)
                x = rng.integers(0, w - cw + 1)
                s = {"image": s["image"][y:y + ch, x:x + cw],
                     "label": s["label"][y:y + ch, x:x + cw]}
                s = random_flip(s, rng)
            s = normalize(s, mean, std)
            s = pad_to(s, crop, seg_pad_val=0)
            imgs.append(s["image"][: crop[0], : crop[1]])
            deps.append(s["label"][: crop[0], : crop[1]])
        return {"image": np.stack(imgs), "label": np.stack(deps)}

    epoch, cursor = 0, 0
    while True:
        yield make_batch(epoch, cursor)
        cursor += batch_size
        if cursor >= len(ds):
            cursor, epoch = 0, epoch + 1
