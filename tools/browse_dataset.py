"""Visualize pipeline output — the reference's tools/browse_dataset.py
(segmentation/tools/browse_dataset.py: walks the train pipeline and writes
image/annotation composites so augmentations can be eyeballed).

Writes ``<out>/sample_{i}_img.png`` and ``_ann.png`` (palette-colored seg
label / turbo-ish depth map / BEV grid raster) for the first N samples the
REAL train iterator of a preset yields — so what you browse is exactly what
the train step sees (post crop/flip/distortion/normalize, de-normalized for
display).

Usage: python tools/browse_dataset.py --preset converge_seg --num 8 \
           --out work_dirs/browse
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _save(arr: np.ndarray, path: str):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


def _colorize_label(label: np.ndarray, palette) -> np.ndarray:
    pal = np.asarray(palette + [[0, 0, 0]], np.uint8)  # 255 → black
    return pal[np.clip(label, 0, len(pal) - 1)]


def _colorize_depth(depth: np.ndarray, max_depth: float) -> np.ndarray:
    t = np.clip(depth / max_depth, 0, 1)
    # simple blue→green→red ramp
    r = np.clip(2 * t - 1, 0, 1)
    g = 1 - np.abs(2 * t - 1)
    b = np.clip(1 - 2 * t, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="converge_seg")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--out", default="work_dirs/browse")
    args = p.parse_args()

    from ddp_tpu.config import get_config
    from ddp_tpu.data import make_train_iter
    from ddp_tpu.data.seg_datasets import (IMAGENET_MEAN, IMAGENET_STD,
                                           PALETTES, _procedural_palette)

    cfg = get_config(args.preset)
    os.makedirs(args.out, exist_ok=True)
    it = make_train_iter(cfg)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    task = cfg.model.task

    written = 0
    while written < args.num:
        batch = next(it)
        imgs = np.asarray(batch["image"])
        labels = np.asarray(batch["label"])
        if imgs.ndim == 5:  # BEV: [b, ncam, H, W, 3] — tile cameras
            b, nc, h, w, _ = imgs.shape
            imgs = imgs.transpose(0, 2, 1, 3, 4).reshape(b, h, nc * w, 3)
        for i in range(imgs.shape[0]):
            if written >= args.num:
                break
            img = np.clip(imgs[i] * std + mean, 0, 255)
            _save(img, os.path.join(args.out, f"sample_{written}_img.png"))
            lbl = labels[i]
            if task == "depth":
                ann = _colorize_depth(lbl, cfg.model.max_depth)
            elif task == "bev":  # [G, G, K] multi-class occupancy
                k = lbl.shape[-1]
                pal = np.asarray(_procedural_palette(k), np.float32)
                ann = np.clip((lbl[..., :, None] * pal).sum(-2), 0, 255)
            else:
                palette = PALETTES.get(cfg.data.dataset,
                                       _procedural_palette(
                                           cfg.model.num_classes))
                ann = _colorize_label(lbl, list(palette))
            _save(ann, os.path.join(args.out, f"sample_{written}_ann.png"))
            written += 1
    print(f"wrote {written} samples to {args.out}")


if __name__ == "__main__":
    main()
