"""Offline dataset converters — the reference's tools/convert_datasets/*
(segmentation/tools/convert_datasets/{cityscapes,voc_aug,...}.py) collapsed
into one entry point. Converts locally-downloaded archives/folders into the
layout `ddp_tpu.data.seg_datasets.SegDataset` indexes. No network access is
used or required.

  cityscapes  — gtFine *_labelIds.png → *_labelTrainIds.png using the same
                labelId→trainId map the loader applies on the fly
                (convert once to skip the per-load remap)
  voc-aug     — SBD `cls/*.mat` + VOC `SegmentationClass` → merged
                `SegmentationClassAug` pngs + train_aug list
                (tools/convert_datasets/voc_aug.py)
  ade20k      — layout check only: ADEChallengeData2016 ships pre-converted

Usage:
  python tools/convert_datasets.py cityscapes /data/cityscapes
  python tools/convert_datasets.py voc-aug /data/VOCdevkit
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_cityscapes(root: str, nproc: int = 1) -> int:
    from PIL import Image

    from ddp_tpu.data.seg_datasets import CITYSCAPES_LABEL2TRAIN

    n = 0
    gt_dir = os.path.join(root, "gtFine")
    for split in sorted(os.listdir(gt_dir)):
        sd = os.path.join(gt_dir, split)
        if not os.path.isdir(sd):
            continue
        for city in sorted(os.listdir(sd)):
            cd = os.path.join(sd, city)
            for f in sorted(os.listdir(cd)):
                if not f.endswith("_gtFine_labelIds.png"):
                    continue
                lbl = np.asarray(Image.open(os.path.join(cd, f)), np.int32)
                tr = CITYSCAPES_LABEL2TRAIN[np.clip(lbl, 0, 255)]
                out = f.replace("_labelIds.png", "_labelTrainIds.png")
                Image.fromarray(tr.astype(np.uint8)).save(
                    os.path.join(cd, out))
                n += 1
    print(f"cityscapes: wrote {n} *_labelTrainIds.png")
    return n


def convert_voc_aug(root: str) -> int:
    """Merge SBD (benchmark_RELEASE) class masks with VOC2012 masks into
    SegmentationClassAug (voc_aug.py semantics: SBD fills images VOC lacks)."""
    from PIL import Image

    voc = os.path.join(root, "VOC2012")
    sbd = os.path.join(root, "benchmark_RELEASE", "dataset")
    out_dir = os.path.join(voc, "SegmentationClassAug")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    names = set()
    # VOC's own masks take precedence
    voc_cls = os.path.join(voc, "SegmentationClass")
    if os.path.isdir(voc_cls):
        for f in sorted(os.listdir(voc_cls)):
            if f.endswith(".png"):
                lbl = np.asarray(Image.open(os.path.join(voc_cls, f)))
                Image.fromarray(lbl.astype(np.uint8)).save(
                    os.path.join(out_dir, f))
                names.add(f[:-4])
                n += 1
    mat_dir = os.path.join(sbd, "cls")
    if os.path.isdir(mat_dir):
        try:
            from scipy.io import loadmat
        except ImportError:
            print("scipy unavailable — skipping SBD .mat masks",
                  file=sys.stderr)
            loadmat = None
        if loadmat is not None:
            for f in sorted(os.listdir(mat_dir)):
                if not f.endswith(".mat") or f[:-4] in names:
                    continue
                m = loadmat(os.path.join(mat_dir, f))
                seg = m["GTcls"][0]["Segmentation"][0].astype(np.uint8)
                Image.fromarray(seg).save(
                    os.path.join(out_dir, f[:-4] + ".png"))
                names.add(f[:-4])
                n += 1
    # train_aug list = union of VOC train and SBD train lists
    lists = []
    for lp in [os.path.join(voc, "ImageSets", "Segmentation", "train.txt"),
               os.path.join(sbd, "train.txt")]:
        if os.path.exists(lp):
            lists += [ln.strip() for ln in open(lp) if ln.strip()]
    if lists:
        ids = sorted(set(lists) & names)
        out_list = os.path.join(voc, "ImageSets", "Segmentation",
                                "train_aug.txt")
        with open(out_list, "w") as f:
            f.write("\n".join(ids) + "\n")
        print(f"voc-aug: wrote {len(ids)} ids to {out_list}")
    print(f"voc-aug: wrote {n} masks to {out_dir}")
    return n


def check_ade20k(root: str) -> int:
    ok = all(os.path.isdir(os.path.join(root, "images", s))
             and os.path.isdir(os.path.join(root, "annotations", s))
             for s in ("training", "validation"))
    print("ade20k layout:", "ok" if ok else
          "MISSING images/ or annotations/ (expected ADEChallengeData2016)")
    return int(ok)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["cityscapes", "voc-aug", "ade20k"])
    p.add_argument("root")
    args = p.parse_args()
    {"cityscapes": convert_cityscapes, "voc-aug": convert_voc_aug,
     "ade20k": check_ade20k}[args.dataset](args.root)


if __name__ == "__main__":
    main()
