"""Ops parity tests against torch oracles (torch used ONLY as a numerics
oracle in tests; the framework itself is torch-free)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.ops.deform_attn import ms_deform_attn_xla
from ddp_tpu.ops.resize import resize


class TestResize:
    def test_bilinear_matches_torch_half_pixel(self):
        import torch
        import torch.nn.functional as F

        x = np.random.randn(2, 7, 9, 3).astype(np.float32)
        got = resize(jnp.asarray(x), (14, 5), mode="bilinear", align_corners=False)
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 5),
                            mode="bilinear", align_corners=False)
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    def test_bilinear_matches_torch_align_corners(self):
        import torch
        import torch.nn.functional as F

        x = np.random.randn(1, 8, 8, 2).astype(np.float32)
        got = resize(jnp.asarray(x), (17, 3), mode="bilinear", align_corners=True)
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(17, 3),
                            mode="bilinear", align_corners=True)
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    def test_nearest_matches_torch(self):
        import torch
        import torch.nn.functional as F

        x = np.random.randn(1, 16, 12, 1).astype(np.float32)
        got = resize(jnp.asarray(x), (4, 3), mode="nearest")
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(4, 3),
                            mode="nearest")
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(), atol=0)


def torch_msda_oracle(value, spatial_shapes, locs, weights):
    """mmcv's pytorch fallback semantics, re-derived with grid_sample."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)  # [B, S, H, D]
    locs = torch.from_numpy(locs)  # [B, Q, H, L, P, 2]
    weights = torch.from_numpy(weights)  # [B, Q, H, L, P]
    b, _, nh, d = value.shape
    q = locs.shape[1]
    out = torch.zeros(b, q, nh, d)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        n = h * w
        v = value[:, start:start + n]  # [B, n, H, D]
        v = v.permute(0, 2, 3, 1).reshape(b * nh, d, h, w)
        g = 2 * locs[:, :, :, lvl] - 1  # [B, Q, H, P, 2]
        g = g.permute(0, 2, 1, 3, 4).reshape(b * nh, q, -1, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)  # [B*H, D, Q, P]
        s = s.reshape(b, nh, d, q, -1)
        wt = weights[:, :, :, lvl].permute(0, 2, 1, 3)[:, :, None]  # [B, H, 1, Q, P]
        out += (s * wt).sum(-1).permute(0, 3, 1, 2)
        start += n
    return out.reshape(b, q, nh * d).numpy()


@pytest.mark.parametrize("shapes", [((6, 8),), ((6, 8), (3, 4))])
def test_ms_deform_attn_matches_grid_sample(shapes):
    rng = np.random.RandomState(3)
    b, nh, d, p = 2, 4, 8, 4
    s = sum(h * w for h, w in shapes)
    q = s
    value = rng.randn(b, s, nh, d).astype(np.float32)
    # locations roam a bit outside [0,1] to exercise zero-padding
    locs = rng.uniform(-0.2, 1.2, (b, q, nh, len(shapes), p, 2)).astype(np.float32)
    w = rng.rand(b, q, nh, len(shapes), p).astype(np.float32)
    w /= w.sum(axis=(-2, -1), keepdims=True)

    got = ms_deform_attn_xla(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    ref = torch_msda_oracle(value, shapes, locs, w)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_grad_flows():
    shapes = ((4, 4),)
    b, nh, d, p = 1, 2, 4, 2
    s = 16
    value = jnp.ones((b, s, nh, d))
    locs = jnp.full((b, s, nh, 1, p, 2), 0.5)
    w = jnp.full((b, s, nh, 1, p), 0.5)

    def f(v, l, wt):
        return ms_deform_attn_xla(v, shapes, l, wt).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_ms_deform_attn_hybrid_fwd_and_grads_match_xla():
    """The hybrid (window fwd / 4-corner bwd, the TPU training fix for the
    libtpu scatter crash — msda_train_notes.md) must match the xla
    formulation in BOTH directions: forwards are the same math, and the
    custom VJP routes gradients through the xla backward."""
    from ddp_tpu.ops.deform_attn import (ms_deform_attn_hybrid,
                                         ms_deform_attn_window)

    shapes = ((6, 8),)
    rng = np.random.RandomState(7)
    b, nh, d, p = 2, 4, 8, 4
    s = 48
    value = jnp.asarray(rng.randn(b, s, nh, d).astype(np.float32))
    locs = jnp.asarray(
        rng.uniform(-0.2, 1.2, (b, s, nh, 1, p, 2)).astype(np.float32))
    w = jnp.asarray(rng.rand(b, s, nh, 1, p).astype(np.float32))

    out_h = ms_deform_attn_hybrid(value, shapes, locs, w)
    out_x = ms_deform_attn_xla(value, shapes, locs, w)
    out_w = ms_deform_attn_window(value, shapes, locs, w)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_w),
                               rtol=1e-5, atol=1e-6)

    def loss_h(v, l, wt):
        return (ms_deform_attn_hybrid(v, shapes, l, wt) ** 2).sum()

    def loss_x(v, l, wt):
        return (ms_deform_attn_xla(v, shapes, l, wt) ** 2).sum()

    gh = jax.grad(loss_h, argnums=(0, 1, 2))(value, locs, w)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(value, locs, w)
    for a, b_ in zip(gh, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)
