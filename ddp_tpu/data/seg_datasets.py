"""Segmentation datasets: ADE20K, Cityscapes, and a synthetic generator.

Parity targets: mmseg `ADE20KDataset` (150 classes, reduce_zero_label —
label 0 is background→255, others shift by −1) and `CityscapesDataset`
(19 classes via labelIds→trainIds mapping) — segmentation/mmseg/datasets/
{ade.py, cityscapes.py, custom.py}.

The loader is a deterministic, seeded, multi-epoch iterator producing global
batches; per-sample RNG = fold(seed, epoch, index) so any batch is
reproducible from (seed, step) alone — replacing DistributedSampler +
per-epoch reseed hooks (SURVEY.md §2.6).
"""
from __future__ import annotations

import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .pipelines import normalize, pad_to, seg_train_pipeline

# Cityscapes labelId -> trainId (34 entries; 255 = ignore)
CITYSCAPES_LABEL2TRAIN = np.full(256, 255, np.int32)
for _lid, _tid in [(7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5), (19, 6),
                   (20, 7), (21, 8), (22, 9), (23, 10), (24, 11), (25, 12),
                   (26, 13), (27, 14), (28, 15), (31, 16), (32, 17), (33, 18)]:
    CITYSCAPES_LABEL2TRAIN[_lid] = _tid


class SegDataset:
    """File-list dataset with task-specific label decoding."""

    def __init__(self, data_root: str, split: str = "train", dataset: str = "ade20k"):
        self.dataset = dataset
        self.data_root = data_root
        self.split = split
        self.items = self._index()

    def _index(self) -> List[Tuple[str, str]]:
        r = self.data_root
        pairs = []
        if self.dataset == "ade20k":
            sub = "training" if self.split == "train" else "validation"
            img_dir = os.path.join(r, "images", sub)
            ann_dir = os.path.join(r, "annotations", sub)
            if os.path.isdir(img_dir):
                for f in sorted(os.listdir(img_dir)):
                    if f.endswith(".jpg"):
                        pairs.append((os.path.join(img_dir, f),
                                      os.path.join(ann_dir, f[:-4] + ".png")))
        elif self.dataset == "cityscapes":
            img_dir = os.path.join(r, "leftImg8bit", self.split)
            ann_dir = os.path.join(r, "gtFine", self.split)
            if os.path.isdir(img_dir):
                for city in sorted(os.listdir(img_dir)):
                    for f in sorted(os.listdir(os.path.join(img_dir, city))):
                        if f.endswith("_leftImg8bit.png"):
                            ann = f.replace("_leftImg8bit.png", "_gtFine_labelIds.png")
                            pairs.append((os.path.join(img_dir, city, f),
                                          os.path.join(ann_dir, city, ann)))
        else:
            raise ValueError(f"unknown dataset {self.dataset!r}")
        return pairs

    def __len__(self):
        return len(self.items)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        img_path, ann_path = self.items[idx]
        img = np.asarray(Image.open(img_path).convert("RGB"), np.float32)
        label = np.asarray(Image.open(ann_path), np.int32)
        if self.dataset == "ade20k":
            # reduce_zero_label: 0 (background) -> 255, shift others by -1
            label = np.where(label == 0, 255, label - 1).astype(np.int32)
        elif self.dataset == "cityscapes":
            label = CITYSCAPES_LABEL2TRAIN[np.clip(label, 0, 255)]
        return {"image": img, "label": label}


class SyntheticSegDataset:
    """Procedural dataset for tests/benchmarks: images with geometric regions
    whose class is a deterministic function of position + per-sample seed, so
    a model CAN learn it (non-trivial but closed-form)."""

    def __init__(self, num_classes: int = 7, size: Tuple[int, int] = (64, 64),
                 length: int = 256):
        self.num_classes = num_classes
        self.size = size
        self.length = length

    def __len__(self):
        return self.length

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(idx)
        h, w = self.size
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        k = self.num_classes
        cx, cy = rng.uniform(0.3, 0.7, 2)
        ang = np.arctan2(yy / h - cy, xx / w - cx)
        label = ((ang + np.pi) / (2 * np.pi) * k).astype(np.int32) % k
        img = np.stack([
            np.cos(2 * np.pi * label / k),
            np.sin(2 * np.pi * label / k),
            rng.normal(0, 0.1, (h, w)),
        ], axis=-1).astype(np.float32) * 64.0 + 128.0
        img += rng.normal(0, 4.0, img.shape)
        return {"image": img.astype(np.float32), "label": label}


def seg_batch_iterator(
    ds, batch_size: int, crop: Tuple[int, int], seed: int = 0,
    img_scale: Optional[Tuple[int, int]] = None, train: bool = True,
    mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
    ratio_range=(0.5, 2.0), cat_max_ratio=0.75, flip_prob=0.5,
    prefetch: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (train) batch iterator with background prefetch thread."""
    img_scale = img_scale or (2048, crop[0])

    def make_batch(epoch: int, start: int) -> Dict[str, np.ndarray]:
        order = np.random.default_rng(seed + epoch).permutation(len(ds))
        imgs, labels = [], []
        for i in range(batch_size):
            idx = int(order[(start + i) % len(ds)])
            sample = ds.load(idx)
            if train:
                rng = np.random.default_rng((seed, epoch, idx))
                sample = seg_train_pipeline(
                    sample, rng, crop, img_scale, ratio_range, cat_max_ratio,
                    flip_prob, mean, std)
            else:
                sample = normalize(sample, mean, std)
                sample = pad_to(sample, crop)
            imgs.append(sample["image"][: crop[0], : crop[1]])
            labels.append(sample["label"][: crop[0], : crop[1]])
        return {"image": np.stack(imgs), "label": np.stack(labels)}

    def gen():
        epoch, cursor = 0, 0
        while True:
            yield make_batch(epoch, cursor)
            cursor += batch_size
            if cursor >= len(ds):
                cursor = 0
                epoch += 1

    if prefetch <= 0:
        yield from gen()
        return

    q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        for b in gen():
            if stop.is_set():
                return
            q.put(b)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
