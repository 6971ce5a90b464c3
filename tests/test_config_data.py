"""Config system, data pipelines, metrics, slide inference tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from ddp_tpu.config import PRESETS, apply_overrides, get_config
from ddp_tpu.data import pipelines as P
from ddp_tpu.data.seg_datasets import SyntheticSegDataset, seg_batch_iterator
from ddp_tpu.evaluation.metrics import SegMetricAccumulator, bev_map_iou, depth_metrics
from ddp_tpu.evaluation.slide import flip_tta, slide_grid, slide_inference


class TestConfig:
    def test_all_presets_build(self):
        for name in PRESETS:
            cfg = get_config(name)
            assert cfg.model.num_classes > 0

    def test_reference_preset_values(self):
        # mirrors configs/ade/ddp_swin_t_2x8_512x512_160k_ade20k.py
        cfg = get_config("ade20k_swin_t")
        assert cfg.model.backbone_variant == "tiny"
        assert cfg.model.bit_scale == 0.01
        assert cfg.model.diffusion.timesteps == 3
        assert cfg.model.diffusion.accumulation
        assert cfg.optim.lr == 6e-5
        assert cfg.optim.grad_clip == 0.1
        assert cfg.runtime.total_iters == 160_000
        # aligned variant: configs/cityscapes/...5k_cityscapes_aligned.py
        al = get_config("cityscapes_convnext_t_aligned")
        assert al.model.self_aligned and al.model.diffusion.timesteps == 10
        assert al.optim.lr == pytest.approx(6e-6)
        assert al.runtime.total_iters == 5000

    def test_overrides_and_coercion(self):
        cfg = get_config("ade20k_swin_t", {
            "model.bit_scale": "0.1",
            "optim.lr": "0.001",
            "runtime.test_mode": "slide",
            "data.crop_size": "(256,256)",
        })
        assert cfg.model.bit_scale == 0.1
        assert cfg.optim.lr == 0.001
        assert cfg.data.crop_size == (256, 256)

    def test_unknown_key_raises(self):
        with pytest.raises((KeyError, AttributeError, TypeError)):
            apply_overrides(get_config("smoke"), {"model.bogus_field": 1})


class TestPipelines:
    def _sample(self, h=64, w=96):
        rng = np.random.default_rng(0)
        return {
            "image": rng.uniform(0, 255, (h, w, 3)).astype(np.float32),
            "label": rng.integers(0, 5, (h, w)).astype(np.int32),
        }

    def test_train_pipeline_output_shape(self):
        rng = np.random.default_rng(1)
        out = P.seg_train_pipeline(self._sample(), rng, crop=(32, 32),
                                   img_scale=(128, 32))
        assert out["image"].shape == (32, 32, 3)
        assert out["label"].shape == (32, 32)

    def test_flip_deterministic_given_rng(self):
        s = self._sample()
        a = P.random_flip(s, np.random.default_rng(3), prob=1.0)
        np.testing.assert_array_equal(a["image"], s["image"][:, ::-1])
        np.testing.assert_array_equal(a["label"], s["label"][:, ::-1])

    def test_hsv_roundtrip(self):
        img = np.random.default_rng(0).uniform(0, 255, (8, 8, 3)).astype(np.float32)
        back = P._hsv_to_rgb(P._rgb_to_hsv(img))
        np.testing.assert_allclose(back, img, atol=0.5)

    def test_crop_cat_max_ratio_avoids_dominant_class(self):
        h = w = 64
        label = np.zeros((h, w), np.int32)
        label[:, 32:] = 1  # two halves; a 32x32 crop inside one half violates 0.75
        s = {"image": np.zeros((h, w, 3), np.float32), "label": label}
        for seed in range(5):
            out = P.random_crop(s, np.random.default_rng(seed), (32, 32),
                                cat_max_ratio=0.75)
            counts = np.bincount(out["label"].reshape(-1), minlength=2)
            assert counts.max() / counts.sum() < 0.75 + 1e-6

    def test_batch_iterator_deterministic(self):
        ds = SyntheticSegDataset(num_classes=4, size=(32, 32), length=16)
        it1 = seg_batch_iterator(ds, 4, (32, 32), seed=7, prefetch=0)
        it2 = seg_batch_iterator(ds, 4, (32, 32), seed=7, prefetch=0)
        b1, b2 = next(it1), next(it2)
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["label"], b2["label"])


class TestMetrics:
    def test_miou_perfect_and_known(self):
        acc = SegMetricAccumulator(3)
        pred = np.array([[0, 1], [2, 2]])
        acc.update(pred, pred)
        m = acc.compute()
        assert m["mIoU"] == 1.0 and m["aAcc"] == 1.0
        acc2 = SegMetricAccumulator(2, ignore_index=255)
        acc2.update(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 255]))
        m2 = acc2.compute()
        # class0: inter 1, union 2 -> 0.5 ; class1: inter 1, union 2 -> 0.5
        assert m2["mIoU"] == pytest.approx(0.5)

    def test_depth_metrics_identity(self):
        gt = np.random.default_rng(0).uniform(1, 10, (4, 8, 8))
        m = depth_metrics(gt, gt)
        assert m["a1"] == 1.0 and m["abs_rel"] == pytest.approx(0.0, abs=1e-9)
        assert m["rmse"] == pytest.approx(0.0, abs=1e-9)

    def test_bev_iou_thresholds(self):
        gt = np.zeros((1, 2, 8, 8))
        gt[0, 0, :4] = 1
        scores = np.zeros_like(gt)
        scores[0, 0, :4] = 0.6  # detected at thresholds <= 0.6
        m = bev_map_iou(scores, gt)
        assert m["iou_class0"] == 1.0 and m["iou_class1"] == 0.0


class TestSlide:
    def test_grid_covers_image(self):
        origins = slide_grid(100, 180, (64, 64), (48, 48))
        cover = np.zeros((100, 180), bool)
        for y, x in origins:
            cover[y:y + 64, x:x + 64] = True
        assert cover.all()

    def test_slide_matches_whole_for_linear_fn(self):
        # predict_fn that depends only on pixel values -> slide == whole
        def fn(img):
            return jnp.stack([img[..., 0], -img[..., 0]], axis=-1)

        img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 40, 56, 3)),
                          jnp.float32)
        out = slide_inference(fn, img, 2, crop=(16, 16), stride=(12, 12))
        np.testing.assert_allclose(out, fn(img), atol=1e-5)

    def test_flip_tta_symmetric(self):
        def fn(img):
            return img[..., :1] * 2.0

        img = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 8, 3)),
                          jnp.float32)
        np.testing.assert_allclose(flip_tta(fn, img), fn(img), atol=1e-6)
