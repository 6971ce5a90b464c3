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


def make_sunrgbd():
    """SUNRGBD layout: jpg images + uint16 depth PNGs stored millimeters
    bit-rotated LEFT by 3 (sunrgbd.py:225-229 decodes with a right-rotate),
    split file with image/depth pairs."""
    rng = np.random.default_rng(7)
    r = os.path.join(ROOT, "sunrgbd")
    os.makedirs(os.path.join(r, "kv1", "image"), exist_ok=True)
    lines = []
    for i in range(2):
        _img(rng, 48, 64).save(os.path.join(r, "kv1", "image", f"{i}.jpg"))
        mm = rng.uniform(500, 7500, (48, 64)).astype(np.uint16)
        mm[0, :4] = 0
        enc = (np.left_shift(mm, 3) | np.right_shift(mm, 13)).astype(np.uint16)
        Image.fromarray(enc).save(os.path.join(r, "kv1", "image", f"{i}.png"))
        lines.append(f"kv1/image/{i}.jpg kv1/image/{i}.png\n")
    for split in ("train", "test"):
        with open(os.path.join(r, f"sunrgbd_{split}.txt"), "w") as f:
            f.writelines(lines)


def make_cityscapes_depth():
    """Cityscapes depth layout: leftImg8bit PNGs + precomputed disparity
    PNGs (raw = disparity*256 + 1, 0 = invalid) + per-image camera JSON
    with fx and baseline; 3-field split lines (cityscapes.py:130-142)."""
    import json

    rng = np.random.default_rng(8)
    r = os.path.join(ROOT, "cityscapes_depth")
    for sub in ("leftImg8bit/train/tiny", "disparity/train/tiny",
                "camera/train/tiny"):
        os.makedirs(os.path.join(r, sub), exist_ok=True)
    baseline, fx = 0.22, 2262.52
    lines = []
    for i in range(2):
        name = f"tiny_{i:06d}"
        _img(rng, 48, 96).save(
            os.path.join(r, "leftImg8bit/train/tiny",
                         f"{name}_leftImg8bit.png"))
        # true depth 5..60 m -> disparity = baseline*fx/depth -> raw uint16
        depth = rng.uniform(5.0, 60.0, (48, 96)).astype(np.float32)
        disp = baseline * fx / depth
        raw = np.round(disp * 256.0 + 1.0).astype(np.uint16)
        raw[0, :4] = 0  # invalid pixels
        Image.fromarray(raw).save(
            os.path.join(r, "disparity/train/tiny", f"{name}_disparity.png"))
        with open(os.path.join(r, "camera/train/tiny",
                               f"{name}_camera.json"), "w") as f:
            json.dump({"extrinsic": {"baseline": baseline},
                       "intrinsic": {"fx": fx}}, f)
        lines.append(
            f"leftImg8bit/train/tiny/{name}_leftImg8bit.png "
            f"disparity/train/tiny/{name}_disparity.png "
            f"camera/train/tiny/{name}_camera.json\n")
    for split in ("train", "test"):
        with open(os.path.join(r, f"cityscapes_{split}.txt"), "w") as f:
            f.writelines(lines)


def make_nuscenes():
    rng = np.random.default_rng(3)
    r = os.path.join(ROOT, "nuscenes")
    os.makedirs(os.path.join(r, "samples"), exist_ok=True)
    os.makedirs(os.path.join(r, "sweeps"), exist_ok=True)
    os.makedirs(os.path.join(r, "maps_bev"), exist_ok=True)
    cams = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT", "CAM_BACK",
            "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]

    def points_bin(path, n):
        # float32 [n, 5]: x, y, z, intensity, ring — LoadPointsFromFile shape
        pts = np.zeros((n, 5), np.float32)
        pts[:, 0] = rng.uniform(-40, 40, n)
        pts[:, 1] = rng.uniform(-40, 40, n)
        pts[:, 2] = rng.uniform(-3, 2, n)
        pts[:, 3] = rng.uniform(0, 255, n)
        pts[:, 4] = rng.integers(0, 32, n)
        pts.tofile(os.path.join(r, path))

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
        lidar_rel = f"samples/{token}_LIDAR_TOP.bin"
        points_bin(lidar_rel, 300)
        sweeps = []
        for sw in range(2):
            srel = f"sweeps/{token}_sweep{sw}_LIDAR_TOP.bin"
            points_bin(srel, 200)
            ang = 0.02 * (sw + 1)
            sweeps.append({
                "data_path": srel,
                "sensor2lidar_rotation": np.array(
                    [[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]),
                "sensor2lidar_translation": np.array([0.3 * (sw + 1), 0, 0]),
                "timestamp": 1_000_000 * s - 50_000 * (sw + 1),
            })
        infos.append({"token": token, "cams": cam_dict,
                      "lidar_path": lidar_rel, "sweeps": sweeps,
                      "timestamp": 1_000_000 * s})
        masks = (rng.random((3, 200, 200)) > 0.7).astype(np.uint8)
        np.savez_compressed(os.path.join(r, "maps_bev", f"{token}.npz"),
                            masks=masks)
    with open(os.path.join(r, "nuscenes_infos_train.pkl"), "wb") as f:
        pickle.dump({"infos": infos}, f)


def make_fill50k():
    """2 real PNG pairs in the tutorial_dataset.py layout (source/target
    dirs + JSON-lines prompt.json)."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ddp_tpu.data.controlnet_data import SyntheticFill50k

    r = os.path.join(ROOT, "fill50k")
    os.makedirs(os.path.join(r, "source"), exist_ok=True)
    os.makedirs(os.path.join(r, "target"), exist_ok=True)
    ds = SyntheticFill50k(size=64)
    prompts = ["red circle with blue background",
               "green circle with yellow background"]
    with open(os.path.join(r, "prompt.json"), "w") as f:
        for i in range(2):
            s = ds.load(i)
            Image.fromarray(
                (s["hint"] * 255).astype(np.uint8)).save(
                os.path.join(r, "source", f"{i}.png"))
            Image.fromarray(
                ((s["image"] + 1) * 127.5).astype(np.uint8)).save(
                os.path.join(r, "target", f"{i}.png"))
            f.write(json.dumps({"source": f"source/{i}.png",
                                "target": f"target/{i}.png",
                                "prompt": prompts[i]}) + "\n")


def make_raw_nuscenes():
    """A 1-scene / 2-keyframe RAW nuScenes tree (JSON tables + bins + jpgs +
    a map-expansion json) exercising tools/prepare_nuscenes.py end-to-end."""
    import json

    rng = np.random.default_rng(4)
    r = os.path.join(ROOT, "nuscenes_raw")
    v = os.path.join(r, "v1.0-mini")
    os.makedirs(v, exist_ok=True)
    for sub in ("samples/LIDAR_TOP", "sweeps/LIDAR_TOP",
                "maps/expansion"):
        os.makedirs(os.path.join(r, sub), exist_ok=True)
    cams = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT", "CAM_BACK",
            "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]
    for cam in cams:
        os.makedirs(os.path.join(r, "samples", cam), exist_ok=True)

    def ident_q():
        return [1.0, 0.0, 0.0, 0.0]

    sensor, calib, ego, sample, sdata = [], [], [], [], []
    sensor.append({"token": "sen_lidar", "channel": "LIDAR_TOP",
                   "modality": "lidar"})
    calib.append({"token": "cs_lidar", "sensor_token": "sen_lidar",
                  "rotation": ident_q(), "translation": [0.9, 0.0, 1.8],
                  "camera_intrinsic": []})
    for ci, cam in enumerate(cams):
        yaw = ci * np.pi / 3
        q = [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]
        sensor.append({"token": f"sen_{cam}", "channel": cam,
                       "modality": "camera"})
        calib.append({"token": f"cs_{cam}", "sensor_token": f"sen_{cam}",
                      "rotation": q, "translation": [1.0, 0.0, 1.5],
                      "camera_intrinsic": [[60.0, 0, 48.0], [0, 60.0, 24.0],
                                           [0, 0, 1]]})

    scene = [{"token": "scene0", "name": "scene-0001", "log_token": "log0"}]
    log = [{"token": "log0", "location": "tiny-town"}]

    def add_pose(tok, t_us, x):
        ego.append({"token": tok, "timestamp": t_us,
                    "rotation": ident_q(),
                    "translation": [x, 0.0, 0.0]})

    sd_tokens = {}
    for si in range(2):
        t_us = 1_000_000 * (si + 1)
        sample.append({"token": f"smp{si}", "timestamp": t_us,
                       "scene_token": "scene0"})
        # key lidar
        add_pose(f"ep_l{si}", t_us, 2.0 * si)
        rel = f"samples/LIDAR_TOP/key{si}.bin"
        pts = np.zeros((200, 5), np.float32)
        pts[:, 0] = rng.uniform(-30, 30, 200)
        pts[:, 1] = rng.uniform(-30, 30, 200)
        pts[:, 2] = rng.uniform(-2, 1, 200)
        pts.tofile(os.path.join(r, rel))
        sd_tokens[f"lid{si}"] = {
            "token": f"lid{si}", "sample_token": f"smp{si}",
            "calibrated_sensor_token": "cs_lidar",
            "ego_pose_token": f"ep_l{si}", "timestamp": t_us,
            "is_key_frame": True, "filename": rel,
            "prev": f"swp{si}" if si >= 0 else "", "next": ""}
        # one intermediate (non-key) sweep before each keyframe
        add_pose(f"ep_s{si}", t_us - 50_000, 2.0 * si - 0.5)
        srel = f"sweeps/LIDAR_TOP/sweep{si}.bin"
        pts = np.zeros((150, 5), np.float32)
        pts[:, 0] = rng.uniform(-30, 30, 150)
        pts[:, 1] = rng.uniform(-30, 30, 150)
        pts.tofile(os.path.join(r, srel))
        sd_tokens[f"swp{si}"] = {
            "token": f"swp{si}", "sample_token": f"smp{si}",
            "calibrated_sensor_token": "cs_lidar",
            "ego_pose_token": f"ep_s{si}", "timestamp": t_us - 50_000,
            "is_key_frame": False, "filename": srel, "prev": "", "next": ""}
        for cam in cams:
            add_pose(f"ep_{cam}{si}", t_us, 2.0 * si)
            crel = f"samples/{cam}/key{si}.jpg"
            _img(rng, 48, 96).save(os.path.join(r, crel))
            sd_tokens[f"{cam}{si}"] = {
                "token": f"{cam}{si}", "sample_token": f"smp{si}",
                "calibrated_sensor_token": f"cs_{cam}",
                "ego_pose_token": f"ep_{cam}{si}", "timestamp": t_us,
                "is_key_frame": True, "filename": crel, "prev": "",
                "next": ""}
    sdata = list(sd_tokens.values())

    # map: one drivable square + one divider line near the origin
    nodes = [{"token": f"n{i}", "x": x, "y": y} for i, (x, y) in enumerate(
        [(-20, -20), (20, -20), (20, 20), (-20, 20), (-15, 0), (15, 0)])]
    map_json = {
        "node": nodes,
        "polygon": [{"token": "p0",
                     "exterior_node_tokens": ["n0", "n1", "n2", "n3"],
                     "holes": []}],
        "line": [{"token": "l0", "node_tokens": ["n4", "n5"]}],
        "drivable_area": [{"token": "d0", "polygon_tokens": ["p0"]}],
        "road_divider": [{"token": "rd0", "line_token": "l0"}],
    }
    with open(os.path.join(r, "maps", "expansion", "tiny-town.json"),
              "w") as f:
        json.dump(map_json, f)

    tables = {"sample": sample, "sample_data": sdata,
              "calibrated_sensor": calib, "ego_pose": ego, "sensor": sensor,
              "scene": scene, "log": log}
    for name, rows in tables.items():
        with open(os.path.join(v, f"{name}.json"), "w") as f:
            json.dump(rows, f)


if __name__ == "__main__":
    make_ade()
    make_cityscapes()
    make_nyu()
    make_sunrgbd()
    make_cityscapes_depth()
    make_nuscenes()
    make_fill50k()
    make_raw_nuscenes()
    total = sum(os.path.getsize(os.path.join(d, f))
                for d, _, fs in os.walk(ROOT) for f in fs)
    print(f"wrote tests/data ({total/1024:.0f} KiB)")
