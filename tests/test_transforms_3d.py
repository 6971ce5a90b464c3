"""BEV 3D pipeline tests (VERDICT r1 item 7): ImageAug3D homography
consistency, GlobalRotScaleTrans matrix/points agreement, GridMask, and
multi-sweep point aggregation."""
import numpy as np

from ddp_tpu.data import transforms_3d as T3


def test_image_aug_homography_roundtrip():
    """A pixel tracked through the image warp must land where the composed
    (post_rot, post_tran) homography says it does — the property LSS
    get_geometry depends on."""
    rng = np.random.default_rng(0)
    n, h, w = 2, 32, 64
    imgs = np.zeros((n, h, w, 3), np.float32)
    # place a bright dot at a known pixel per camera
    src = [(10, 20), (25, 50)]
    for i, (v, u) in enumerate(src):
        imgs[i, v, u] = 1000.0
    prots = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    ptrans = np.zeros((n, 3), np.float32)
    cfg = T3.ImageAug3DConfig(final_dim=(h, w), resize_lim=(0.9, 1.1),
                              bot_pct_lim=(0.0, 0.1), rot_lim=(-4.0, 4.0),
                              rand_flip=True)
    out, rots, trans = T3.image_aug_3d(imgs, prots, ptrans, rng, cfg,
                                       is_train=True)
    assert out.shape == (n, h, w, 3)
    for i, (v, u) in enumerate(src):
        # predicted destination of the dot under the composed homography
        dst = rots[i, :2, :2] @ np.array([u, v], np.float32) + trans[i, :2]
        du, dv = dst
        if 1 <= du < w - 1 and 1 <= dv < h - 1:
            # brightest pixel of the warped image ≈ predicted location
            vi, ui = np.unravel_index(np.argmax(out[i].sum(-1)),
                                      (h, w))
            assert abs(ui - du) <= 2.0 and abs(vi - dv) <= 2.0, (
                i, (ui, vi), (du, dv))


def test_image_aug_eval_deterministic():
    rng = np.random.default_rng(0)
    imgs = np.random.default_rng(1).normal(size=(1, 16, 32, 3)).astype(np.float32)
    prots = np.tile(np.eye(3, dtype=np.float32), (1, 1, 1))
    ptrans = np.zeros((1, 3), np.float32)
    cfg = T3.ImageAug3DConfig(final_dim=(16, 32), resize_lim=(1.0, 1.0))
    a, _, _ = T3.image_aug_3d(imgs, prots, ptrans, rng, cfg, is_train=False)
    b, _, _ = T3.image_aug_3d(imgs, prots, ptrans, rng, cfg, is_train=False)
    np.testing.assert_allclose(a, b)


def test_global_rot_scale_trans_matrix_matches_points():
    rng = np.random.default_rng(3)
    pts = np.random.default_rng(4).normal(size=(50, 5)).astype(np.float32)
    out, T = T3.global_rot_scale_trans(rng, pts.copy(), resize_lim=(0.9, 1.1),
                                       rot_lim=(-0.5, 0.5), trans_lim=0.3)
    want = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out[:, :3], want, rtol=1e-5, atol=1e-5)
    # eval: identity
    _, T_eval = T3.global_rot_scale_trans(rng, None, is_train=False)
    np.testing.assert_allclose(T_eval, np.eye(4))


def test_rotate_bev_masks_identity_and_rotation():
    g, k, scope = 20, 2, 8.0
    masks = np.zeros((g, g, k), np.float32)
    masks[5:8, 5:8, 0] = 1.0
    same = T3.rotate_bev_masks(masks, np.eye(4, dtype=np.float32), scope)
    np.testing.assert_allclose(same, masks)
    # 90° rotation moves mass but conserves it approximately
    c, s = 0.0, 1.0
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    rot = T3.rotate_bev_masks(masks, T, scope)
    assert 0.5 * masks.sum() <= rot.sum() <= 1.5 * masks.sum()
    assert not np.allclose(rot, masks)


def test_grid_mask_drops_and_keeps():
    rng = np.random.default_rng(0)
    imgs = np.ones((2, 24, 24, 3), np.float32)
    out = T3.grid_mask(imgs, rng, prob=1.0, mode=1)
    frac = out.mean()
    assert 0.0 < frac < 1.0  # some pixels dropped, some kept
    # prob 0 → untouched
    out2 = T3.grid_mask(imgs, np.random.default_rng(1), prob=0.0)
    np.testing.assert_allclose(out2, imgs)


def test_multi_sweep_points():
    rng = np.random.default_rng(0)
    key = np.random.default_rng(1).normal(size=(100, 5)).astype(np.float32) * 5
    rot = np.asarray([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    sweeps = [{
        "points": np.random.default_rng(2 + i).normal(size=(50, 5)).astype(np.float32) * 5,
        "sensor2lidar_rotation": rot,
        "sensor2lidar_translation": np.asarray([1.0, 0, 0], np.float32),
        "timestamp": -0.1 * (i + 1),
    } for i in range(3)]
    out = T3.multi_sweep_points(key, sweeps, rng, sweeps_num=2, timestamp=0.0,
                                remove_close=False)
    assert out.shape == (100 + 2 * 50, 5)
    # keyframe time channel zeroed; sweep lags positive
    np.testing.assert_allclose(out[:100, 4], 0.0)
    assert (out[100:, 4] > 0).all()
    # transform applied: first sweep point maps through rot + trans
    sw_pts = out[100:150, :3]
    assert np.isfinite(sw_pts).all()


def test_multi_sweep_pad_empty():
    rng = np.random.default_rng(0)
    key = np.ones((10, 5), np.float32) * 3
    out = T3.multi_sweep_points(key, [], rng, sweeps_num=4, remove_close=True)
    assert out.shape[0] == 10 * 5  # key + 4 repeats (none close to origin)


def test_bev_iterator_with_aug():
    from ddp_tpu.data.bev_datasets import SyntheticBEVDataset, bev_batch_iterator

    ds = SyntheticBEVDataset()
    it = bev_batch_iterator(ds, 2, aug=True)
    b = next(it)
    assert b["image"].shape == (2, 2, 32, 64, 3)
    assert b["label"].shape == (2, 20, 20, 3)
    assert np.isfinite(b["image"]).all()
    # aug actually changes the calibration vs the clean iterator
    clean = next(bev_batch_iterator(ds, 2, aug=False))
    assert not np.allclose(b["cam2lidar_rots"], clean["cam2lidar_rots"])
