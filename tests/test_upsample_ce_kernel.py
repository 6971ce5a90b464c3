"""Parity of the fused Pallas upsample+CE kernel (interpret mode) against
the XLA phase implementation — values, accuracy, and gradients.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.nn.losses import cross_entropy_seg_upsampled


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # stays set across the whole test so the custom_vjp BACKWARD (traced
    # lazily by value_and_grad, after the fwd call returns) also sees it
    monkeypatch.setenv("DDP_TPU_FUSED_CE", "interpret")


def _run_fused(logits, labels, scale, with_acc=False):
    from ddp_tpu.ops.pallas.upsample_ce import fused_upsample_ce

    return fused_upsample_ce(logits, labels, scale, with_acc=with_acc)


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("h,w,k", [(8, 16, 7), (12, 16, 19)])
def test_kernel_value_and_grad_parity(scale, h, w, k):
    rng = np.random.RandomState(0)
    b = 2
    logits = jnp.asarray(rng.randn(b, h, w, k), jnp.float32)
    labels = rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32)
    labels[0, :3, :5] = 255
    labels = jnp.asarray(labels)

    def ref(lg):
        return cross_entropy_seg_upsampled(lg, labels, scale)

    def fused(lg):
        return _run_fused(lg, labels, scale)

    l_ref, g_ref = jax.value_and_grad(ref)(logits)
    l_fus, g_fus = jax.value_and_grad(fused)(logits)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_kernel_acc_parity():
    rng = np.random.RandomState(1)
    b, h, w, k, scale = 1, 8, 8, 5, 4
    logits = jnp.asarray(rng.randn(b, h, w, k), jnp.float32)
    labels = rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32)
    labels[0, -3:, :] = 255
    labels = jnp.asarray(labels)
    _, acc_ref = cross_entropy_seg_upsampled(logits, labels, scale,
                                             with_acc=True)
    _, acc_fus = _run_fused(logits, labels, scale, with_acc=True)
    np.testing.assert_allclose(float(acc_fus), float(acc_ref), atol=1e-6)


def test_kernel_row_padding():
    """h not divisible by the row-block size exercises the pad+mask path."""
    rng = np.random.RandomState(2)
    b, h, w, k, scale = 1, 10, 16, 6, 4  # TB=8 -> hp=16, 6 padded rows
    logits = jnp.asarray(rng.randn(b, h, w, k), jnp.float32)
    labels = jnp.asarray(
        rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32))
    l_ref, g_ref = jax.value_and_grad(
        lambda lg: cross_entropy_seg_upsampled(lg, labels, scale))(logits)
    l_fus, g_fus = jax.value_and_grad(
        lambda lg: _run_fused(lg, labels, scale))(logits)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_kernel_bf16_input():
    rng = np.random.RandomState(3)
    b, h, w, k, scale = 1, 8, 16, 9, 4
    logits = jnp.asarray(rng.randn(b, h, w, k), jnp.bfloat16)
    labels = jnp.asarray(
        rng.randint(0, k, (b, scale * h, scale * w)).astype(np.int32))
    l_ref = cross_entropy_seg_upsampled(logits.astype(jnp.float32), labels,
                                        scale)
    l_fus = _run_fused(logits, labels, scale)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=5e-3)
