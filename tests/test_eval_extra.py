"""Tests: multi-scale flip TTA, distributed metric gather, dataset registry,
dataset wrappers, log analyzer round-trip."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.data.seg_datasets import (ConcatDataset, NUM_CLASSES, PALETTES,
                                       RepeatDataset, SyntheticSegDataset,
                                       normalize_image, voc_palette)
from ddp_tpu.evaluation.dist import allgather_metrics, broadcast_from_host0
from ddp_tpu.evaluation.slide import flip_tta, multi_scale_flip_tta


def test_multi_scale_flip_tta_identity_model():
    # a scale/flip-equivariant predictor: per-pixel function of the image
    def predict(img):
        return jnp.stack([img[..., 0], -img[..., 0]], axis=-1)

    img = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    out = multi_scale_flip_tta(predict, img, scales=(1.0,), flip=True)
    # flip-TTA of an equivariant model == plain prediction
    np.testing.assert_allclose(np.asarray(out), np.asarray(predict(img)),
                               rtol=1e-5, atol=1e-5)
    out_ms = multi_scale_flip_tta(predict, img, scales=(0.5, 1.0, 2.0))
    assert out_ms.shape == (1, 16, 16, 2)


def test_allgather_metrics_single_process_identity():
    m = {"inter": np.arange(5), "union": np.ones(5)}
    out = allgather_metrics(m)
    np.testing.assert_array_equal(out["inter"], m["inter"])
    t = broadcast_from_host0({"a": np.ones(3)})
    np.testing.assert_array_equal(t["a"], np.ones(3))


def test_dataset_registry_and_wrappers():
    assert NUM_CLASSES["ade20k"] == 150
    assert len(PALETTES["cityscapes"]) == 19
    assert voc_palette()[0] == [0, 0, 0]
    ds = SyntheticSegDataset(length=4)
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 12
    np.testing.assert_array_equal(rep.load(5)["label"], ds.load(1)["label"])
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 8
    np.testing.assert_array_equal(cat.load(6)["label"], ds.load(2)["label"])
    img = ds.load(0)["image"]
    n = normalize_image(img)
    assert n.dtype == np.float32 and abs(float(n.mean())) < 3.0


def test_analyze_logs_tool(tmp_path):
    import subprocess
    import sys

    log = tmp_path / "train_log.jsonl"
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps({"step": i * 50, "loss": 3.0 / (i + 1),
                                "steps_per_s": 2.0}) + "\n")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "analyze_logs.py"), str(tmp_path)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "loss" in r.stdout and "avg speed" in r.stdout


def test_microbatched_call_matches_direct():
    """Serving-side working-set split (b8_cliff_notes.md): slicing the batch
    must reproduce the direct call exactly, including the padded tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddp_tpu.evaluation.batched import microbatched_call

    calls = []

    @jax.jit
    def fn(img, scale):
        return img * 2.0 + scale[:, None]

    def counting_fn(img, scale):
        calls.append(img.shape[0])
        return fn(img, scale)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(7, 5, 3), jnp.float32)
    scale = jnp.asarray(rng.randn(7, 3), jnp.float32)
    got = microbatched_call(counting_fn, img, scale, microbatch=4)
    want = fn(img, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    assert calls == [4, 4]  # one compiled shape, padded tail
    # small batches pass through untouched
    calls.clear()
    got2 = microbatched_call(counting_fn, img[:3], scale[:3], microbatch=4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want[:3]),
                               rtol=1e-6)
    assert calls == [3]
