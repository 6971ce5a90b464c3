"""Generate the committed tiny real-format data under tests/data/
(VERDICT r2 missing #8): 2 ADE-format pairs, 2 Cityscapes-format pairs, 2
NYU depth pairs + split file, and a 2-sample nuScenes infos pkl with 6-cam
jpgs + BEV mask npz blobs. Deterministic; re-running reproduces the same
bytes (fixed seeds, no timestamps).

Run from the repo root:  python tests/make_tiny_data.py
"""
import os
import pickle

import numpy as np
from PIL import Image

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _img(rng, h, w):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
                           "RGB")


def make_ade():
    rng = np.random.default_rng(0)
    for split in ("training", "validation"):
        idir = os.path.join(ROOT, "ade", "images", split)
        adir = os.path.join(ROOT, "ade", "annotations", split)
        os.makedirs(idir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        for i in range(2):
            _img(rng, 48, 64).save(os.path.join(idir, f"ADE_{split[:5]}_{i}.jpg"))
            # raw labels in [0, 7]: 0 = background (reduce_zero -> 255),
            # 1..7 -> train ids 0..6 (fits the 7-class smoke model)
            lab = rng.integers(0, 8, (48, 64), dtype=np.uint8)
            Image.fromarray(lab, "L").save(
                os.path.join(adir, f"ADE_{split[:5]}_{i}.png"))


def make_cityscapes():
    rng = np.random.default_rng(1)
    valid_label_ids = np.array([7, 8, 11, 12, 13, 17, 19, 0])  # incl. void 0
    for split in ("train", "val"):
        idir = os.path.join(ROOT, "cityscapes", "leftImg8bit", split, "tiny")
        adir = os.path.join(ROOT, "cityscapes", "gtFine", split, "tiny")
        os.makedirs(idir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        for i in range(2):
            _img(rng, 48, 96).save(
                os.path.join(idir, f"tiny_{i:06d}_leftImg8bit.png"))
            lab = valid_label_ids[rng.integers(0, len(valid_label_ids),
                                               (48, 96))].astype(np.uint8)
            Image.fromarray(lab, "L").save(
                os.path.join(adir, f"tiny_{i:06d}_gtFine_labelIds.png"))


def make_nyu():
    rng = np.random.default_rng(2)
    r = os.path.join(ROOT, "nyu")
    os.makedirs(os.path.join(r, "image"), exist_ok=True)
    os.makedirs(os.path.join(r, "depth"), exist_ok=True)
    lines = []
    for i in range(2):
        _img(rng, 48, 64).save(os.path.join(r, "image", f"{i}.jpg"))
        # 16-bit depth png, scale 1000 (millimeters), 0 = invalid
        d = rng.uniform(500, 9500, (48, 64)).astype(np.uint16)
        d[0, :4] = 0
        Image.fromarray(d).save(os.path.join(r, "depth", f"{i}.png"))
        lines.append(f"image/{i}.jpg depth/{i}.png 518.8579\n")
    for split in ("train", "test"):
        with open(os.path.join(r, f"nyu_{split}.txt"), "w") as f:
            f.writelines(lines)


def make_nuscenes():
    rng = np.random.default_rng(3)
    r = os.path.join(ROOT, "nuscenes")
    os.makedirs(os.path.join(r, "samples"), exist_ok=True)
    os.makedirs(os.path.join(r, "maps_bev"), exist_ok=True)
    cams = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT", "CAM_BACK",
            "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]
    infos = []
    for s in range(2):
        token = f"tinytoken{s}"
        cam_dict = {}
        for ci, cam in enumerate(cams):
            rel = f"samples/{token}_{cam}.jpg"
            _img(rng, 48, 96).save(os.path.join(r, rel))
            yaw = ci * np.pi / 3
            rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                            [np.sin(yaw), np.cos(yaw), 0],
                            [0, 0, 1]], np.float64)
            cam_dict[cam] = {
                "data_path": rel,
                "sensor2lidar_rotation": rot,
                "sensor2lidar_translation": np.array([0.5, 0.0, 1.6]),
                "camera_intrinsics": np.array(
                    [[60.0, 0, 48.0], [0, 60.0, 24.0], [0, 0, 1]]),
            }
        infos.append({"token": token, "cams": cam_dict})
        masks = (rng.random((3, 200, 200)) > 0.7).astype(np.uint8)
        np.savez_compressed(os.path.join(r, "maps_bev", f"{token}.npz"),
                            masks=masks)
    with open(os.path.join(r, "nuscenes_infos_train.pkl"), "wb") as f:
        pickle.dump({"infos": infos}, f)


if __name__ == "__main__":
    make_ade()
    make_cityscapes()
    make_nyu()
    make_nuscenes()
    total = sum(os.path.getsize(os.path.join(d, f))
                for d, _, fs in os.walk(ROOT) for f in fs)
    print(f"wrote tests/data ({total/1024:.0f} KiB)")
