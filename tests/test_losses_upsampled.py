"""Parity of the phase-decomposed fused upsample+CE against the reference
composition resize_bilinear + cross_entropy_seg (values AND gradients).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.nn.losses import (cross_entropy_seg, cross_entropy_seg_upsampled,
                               seg_accuracy)
from ddp_tpu.ops.resize import resize


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_upsampled_ce_matches_resize_ce(scale, dtype):
    rng = np.random.RandomState(0)
    b, h, w, k = 2, 12, 16, 19
    logits = jnp.asarray(rng.randn(b, h, w, k), dtype)
    labels = rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32)
    labels[0, :3, :5] = 255  # ignore regions
    labels = jnp.asarray(labels)

    def ref(lg):
        up = resize(lg.astype(jnp.float32), (scale * h, scale * w),
                    mode="bilinear", align_corners=False)
        return cross_entropy_seg(up, labels)

    def fused(lg):
        return cross_entropy_seg_upsampled(lg, labels, scale)

    tol = 1e-6 if dtype == jnp.float32 else 2e-3
    l_ref, g_ref = jax.value_and_grad(ref)(logits)
    l_fus, g_fus = jax.value_and_grad(fused)(logits)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(g_fus, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=5e-2, atol=tol * 20)


def test_fused_upsampled_acc_matches():
    rng = np.random.RandomState(1)
    b, h, w, k, scale = 2, 8, 8, 7, 4
    logits = jnp.asarray(rng.randn(b, h, w, k), jnp.float32)
    labels = rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32)
    labels[1, -2:, :] = 255
    labels = jnp.asarray(labels)
    up = resize(logits, (scale * h, scale * w), mode="bilinear",
                align_corners=False)
    acc_ref = seg_accuracy(up, labels)
    _, acc_fus = cross_entropy_seg_upsampled(logits, labels, scale,
                                             with_acc=True)
    np.testing.assert_allclose(float(acc_fus), float(acc_ref), atol=1e-6)


def test_fused_upsampled_ce_all_ignore_and_edges():
    """All-ignore labels -> 0 loss; and edge clamping agrees with the
    resize path at the borders (1-row grids stress the clamp)."""
    logits = jnp.asarray(np.random.RandomState(2).randn(1, 2, 2, 5),
                         jnp.float32)
    labels = jnp.full((1, 8, 8), 255, jnp.int32)
    loss = cross_entropy_seg_upsampled(logits, labels, 4)
    assert float(loss) == 0.0
