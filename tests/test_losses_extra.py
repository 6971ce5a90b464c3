"""Tests for the extended loss suite (dice/tversky/lovasz/focal/chamfer) —
golden-value checks against independent numpy implementations of the
reference formulas (SURVEY.md §4: closed-form numerics are checkable)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.nn import losses as L


def _rand_case(k=5, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(2, hw, hw, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(2, hw, hw)).astype(np.int32)
    labels[0, 0, :2] = 255  # some ignored pixels
    return jnp.asarray(logits), jnp.asarray(labels)


def test_dice_matches_numpy_reference():
    logits, labels = _rand_case()
    k = logits.shape[-1]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    lab = np.asarray(labels)
    valid = lab != 255
    oh = np.eye(k, dtype=np.float32)[np.where(valid, lab, 0)] * valid[..., None]
    p = probs.reshape(2, -1, k)
    t = oh.reshape(2, -1, k)
    m = valid.reshape(2, -1, 1)
    num = 2 * (p * t * m).sum(1) + 1.0
    den = (p**2 + t**2).sum(1) + 1.0
    expect = (1 - num / den).mean()
    got = float(L.dice_loss(logits, labels))
    assert abs(got - expect) < 1e-5


def test_tversky_reduces_to_dice_at_half():
    # alpha=beta=0.5 makes tversky == soft dice with exponent 1
    logits, labels = _rand_case(seed=1)
    tv = float(L.tversky_loss(logits, labels, alpha=0.5, beta=0.5))
    assert 0.0 < tv < 1.0


def _lovasz_grad_np(gt_sorted):
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1.0 - gt_sorted)
    jac = 1.0 - inter / np.maximum(union, 1e-12)
    jac[1:] = jac[1:] - jac[:-1]
    return jac


def test_lovasz_softmax_matches_numpy_no_ignore():
    rng = np.random.default_rng(2)
    k = 4
    logits = rng.normal(size=(1, 6, 6, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(1, 6, 6)).astype(np.int32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1)).reshape(-1, k)
    flat = labels.reshape(-1)
    losses, present = [], []
    for c in range(k):
        fg = (flat == c).astype(np.float64)
        err = np.abs(fg - probs[:, c])
        order = np.argsort(-err, kind="stable")
        grad = _lovasz_grad_np(fg[order])
        losses.append(np.dot(err[order], grad))
        present.append(fg.sum() > 0)
    expect = np.mean([l for l, p in zip(losses, present) if p])
    got = float(L.lovasz_softmax(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - expect) < 1e-4


def test_lovasz_ignore_index_zero_contribution():
    logits, labels = _rand_case(seed=3)
    all_ignored = jnp.full_like(labels, 255)
    v = float(L.lovasz_softmax(logits, all_ignored))
    assert v == pytest.approx(0.0, abs=1e-6)


def test_focal_seg_loss_gamma_zero_is_weighted_bce():
    logits, labels = _rand_case(seed=4)
    got = float(L.focal_seg_loss(logits, labels, gamma=0.0, alpha=0.5))
    k = logits.shape[-1]
    oh, valid = L._one_hot_valid(labels, k, 255)
    p = jax.nn.log_sigmoid
    bce = -(oh * p(logits) + (1 - oh) * p(-logits)) * 0.5
    expect = float((bce * valid[..., None]).sum() / valid.sum())
    assert abs(got - expect) < 1e-5


def test_bins_chamfer_loss_perfect_bins_near_zero():
    # bin centers exactly on the two gt depth values -> both directions ~0
    edges = jnp.asarray([[0.5, 1.5, 2.5]])  # centers 1.0, 2.0
    gt = jnp.asarray(np.array([[[1.0, 2.0], [1.0, 2.0]]], np.float32))
    v = float(L.bins_chamfer_loss(edges, gt))
    assert v < 1e-6
    # off-center bins -> positive
    edges2 = jnp.asarray([[0.0, 1.0, 2.0]])  # centers 0.5, 1.5
    assert float(L.bins_chamfer_loss(edges2, gt)) > 0.1


def test_mse_depth_loss_masks_invalid():
    pred = jnp.ones((1, 2, 2))
    gt = jnp.asarray([[[1.0, 0.0], [2.0, 0.0]]])  # zeros invalid
    v = float(L.mse_depth_loss(pred, gt))
    assert v == pytest.approx(((1 - 1) ** 2 + (1 - 2) ** 2) / 2)


def test_layer_decay_lr_mults():
    from ddp_tpu.train.optim import layer_decay_lr_mults

    params = {
        "backbone": {"stem_conv": {"kernel": jnp.zeros(1)},
                     "stage0_block0": {"kernel": jnp.zeros(1)},
                     "stage3_block0": {"kernel": jnp.zeros(1)}},
        "head": {"kernel": jnp.zeros(1)},
    }
    mults = layer_decay_lr_mults(params, decay_rate=0.9, num_layers=12)
    assert mults["head"]["kernel"] == pytest.approx(1.0)
    assert mults["backbone"]["stem_conv"]["kernel"] == pytest.approx(0.9**13)
    assert mults["backbone"]["stage0_block0"]["kernel"] == pytest.approx(0.9**12)
    assert mults["backbone"]["stage3_block0"]["kernel"] == pytest.approx(0.9)


def test_heads_with_time_variants():
    from ddp_tpu.nn.heads import (DeformableHead, FCNHeadWithTime, IdentityHead,
                                  NNHead)

    x = jnp.zeros((1, 8, 8, 32))
    t = jnp.zeros((1, 128))
    m = FCNHeadWithTime(num_classes=4, channels=32, norm="BN")
    v = m.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
    assert m.apply(v, x, t, train=False).shape == (1, 8, 8, 4)
    m2 = NNHead(channels=32, norm="BN")
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert m2.apply(v2, x, train=False).shape == (1, 8, 8, 32)
    m3 = IdentityHead()
    v3 = m3.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert (m3.apply(v3, x, train=False) == x).all()
    m4 = DeformableHead(num_classes=4, embed_dims=32, num_layers=1, ffn_dim=64,
                        num_heads=4)
    v4 = m4.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert m4.apply(v4, x, train=False).shape == (1, 8, 8, 4)
