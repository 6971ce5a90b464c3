"""Tests for the camera-only BEV stack: bev_pool, geometry, grid transform,
and the end-to-end DDPBEVCamera model at nano scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.models.bev import DDPBEVCamera
from ddp_tpu.nn.bev import bev_grid_transform, frustum_grid, lss_geometry
from ddp_tpu.ops.bev_pool import bev_pool, quantize_geometry

pytestmark = pytest.mark.slow


class TestBevPool:
    def test_scatter_sum_matches_numpy(self):
        rng = np.random.RandomState(0)
        b, p, c, nx, ny, nz = 2, 64, 5, 4, 6, 2
        feats = rng.randn(b, p, c).astype(np.float32)
        coords = rng.randint(-1, max(nx, ny, nz) + 1, (b, p, 3)).astype(np.int32)
        valid = ((coords[..., 0] >= 0) & (coords[..., 0] < nx)
                 & (coords[..., 1] >= 0) & (coords[..., 1] < ny)
                 & (coords[..., 2] >= 0) & (coords[..., 2] < nz))
        got = bev_pool(jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid),
                       nx, ny, nz)
        expect = np.zeros((b, nx, ny, nz * c), np.float32)
        for bi in range(b):
            for pi in range(p):
                if valid[bi, pi]:
                    x, y, z = coords[bi, pi]
                    expect[bi, x, y, z * c:(z + 1) * c] += feats[bi, pi]
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_quantize_geometry(self):
        geom = jnp.asarray([[0.0, 0.0, 0.0], [-51.3, 0.0, 0.0], [51.0, 51.0, 0.0]])
        idx, ok = quantize_geometry(geom, (-51.0, -51.0, 0.0), (0.4, 0.4, 20.0),
                                    (256, 256, 1))
        assert bool(ok[0]) and not bool(ok[1]) and bool(ok[2])
        # center point -> cell ~128
        assert 126 <= int(idx[0, 0]) <= 129

    def test_bev_pool_grad(self):
        feats = jnp.ones((1, 8, 3))
        coords = jnp.zeros((1, 8, 3), jnp.int32)
        valid = jnp.ones((1, 8), bool)

        g = jax.grad(lambda f: bev_pool(f, coords, valid, 2, 2, 1).sum())(feats)
        np.testing.assert_allclose(g, np.ones_like(g))


class TestGeometry:
    def test_identity_camera_unprojection(self):
        """With identity extrinsics/post and pinhole intrinsics, a frustum
        point at pixel (cx, cy) depth d must unproject to (0, 0, d)-ish on the
        optical axis."""
        f = frustum_grid((32, 32), (4, 4), (1.0, 9.0, 2.0))
        intr = np.eye(3, dtype=np.float32)
        intr[0, 0] = intr[1, 1] = 20.0
        intr[0, 2] = intr[1, 2] = 15.5  # principal point center of 32px image
        eye = np.eye(3, dtype=np.float32)
        geom = lss_geometry(
            jnp.asarray(f),
            jnp.asarray(eye)[None, None], jnp.zeros((1, 1, 3)),
            jnp.asarray(intr)[None, None],
            jnp.asarray(eye)[None, None], jnp.zeros((1, 1, 3)),
        )
        # the frustum pixel nearest the principal point maps near the axis
        g = np.asarray(geom)[0, 0]  # [D, 4, 4, 3]
        d_idx, pix = 1, 2  # depth 3.0, pixel (2,2) at ~(20.7, 20.7)
        pt = g[d_idx, pix, pix]
        assert abs(pt[2] - 3.0) < 1e-5  # z = depth
        assert np.all(np.abs(pt[:2]) < 2.0)

    def test_grid_transform_identity_scope(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 2), jnp.float32)
        # same scope, same resolution -> identity (up to border interpolation)
        scope = ((-4.0, 4.0, 1.0), (-4.0, 4.0, 1.0))
        out = bev_grid_transform(x, scope, scope)
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_grid_transform_matches_torch_grid_sample(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(1).randn(2, 16, 16, 3).astype(np.float32)
        input_scope = [(-51.2, 51.2, 6.4), (-51.2, 51.2, 6.4)]
        output_scope = [(-50.0, 50.0, 5.0), (-50.0, 50.0, 5.0)]
        got = bev_grid_transform(jnp.asarray(x), input_scope, output_scope)

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        coords = []
        for (imin, imax, _), (omin, omax, ostep) in zip(input_scope, output_scope):
            v = torch.arange(omin + ostep / 2, omax, ostep)
            coords.append((v - imin) / (imax - imin) * 2 - 1)
        u, v = torch.meshgrid(coords[0], coords[1], indexing="ij")
        grid = torch.stack([v, u], dim=-1)[None].repeat(2, 1, 1, 1)
        ref = F.grid_sample(xt, grid, mode="bilinear", align_corners=False)
        np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-4, atol=1e-5)


NANO_BEV = dict(
    num_classes=3,
    embed_dims=32,
    backbone_variant="nano",
    image_size=(32, 64),
    out_grid=20,
    input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
    output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
    xbound=(-8.0, 8.0, 0.5), ybound=(-8.0, 8.0, 0.5),
    zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0),
    lss_out_channels=16,
    bev_blocks=((1, 24, 2), (1, 32, 1)),
    decoder_layers=1,
    decoder_heads=4,
    decoder_ffn_dim=64,
    diffusion=DiffusionConfig(timesteps=2, randsteps=2),
    drop_path_rate=0.0,
)
# xbound 0.5 over 16m -> 32 cells, downsample 2 -> latent grid 16
# input_scope 1.0 -> 16 cells == latent grid ✓


def _camera_rig(b=1, n=2):
    rng = np.random.RandomState(0)
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 40.0
    intr[..., 0, 2] = 31.5
    intr[..., 1, 2] = 15.5
    intr[..., 2, 2] = 1.0
    rots = np.zeros((b, n, 3, 3), np.float32)
    for i in range(n):
        ang = 2 * np.pi * i / n
        c, s = np.cos(ang), np.sin(ang)
        # camera z (optical axis) points outward in the xy ground plane
        rz = np.array([[c, 0, s], [s * 0, 1, 0], [-s, 0, c]], np.float32)
        look = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32).T
        rots[:, i] = rz @ look
    trans = rng.uniform(-0.5, 0.5, (b, n, 3)).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    zero = np.zeros((b, n, 3), np.float32)
    return (jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(intr),
            jnp.asarray(eye), jnp.asarray(zero))


@pytest.fixture(scope="module")
def bev_model():
    model = DDPBEVCamera(**NANO_BEV)
    b, n = 1, 2
    img = jnp.zeros((b, n, 32, 64, 3))
    gt = jnp.zeros((b, 20, 20, 3), jnp.int32)
    rig = _camera_rig(b, n)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img, *rig, gt, train=False,
    )
    return model, variables, rig


def test_bev_train_loss(bev_model):
    model, variables, rig = bev_model
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(1, 2, 32, 64, 3), jnp.float32)
    gt = jnp.asarray(rng.randint(0, 2, (1, 20, 20, 3)), jnp.int32)
    (loss, logs), _ = model.apply(
        variables, img, *rig, gt, train=True,
        rngs={"diffusion": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert any(k.startswith("map.") for k in logs)


def test_bev_sample(bev_model):
    model, variables, rig = bev_model
    img = jnp.asarray(np.random.RandomState(2).randn(1, 2, 32, 64, 3), jnp.float32)
    out = model.apply(variables, img, *rig, method=model.sample,
                      rngs={"diffusion": jax.random.PRNGKey(5)})
    assert out.shape == (1, 20, 20, 3)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()  # sigmoid-prob scores


def test_bev_window_decoder_sample():
    """decoder_attn='window' variant (the flagship choice for the 200x200
    grid where the MSDA gather temp OOMs a v5e — see README decoder
    decision): build + one sample pass."""
    model = DDPBEVCamera(**{**NANO_BEV, "decoder_attn": "window"})
    b, n = 1, 2
    img = jnp.zeros((b, n, 32, 64, 3))
    gt = jnp.zeros((b, 20, 20, 3), jnp.int32)
    rig = _camera_rig(b, n)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img, *rig, gt, train=False,
    )
    out = model.apply(variables, img, *rig, method=model.sample,
                      rngs={"diffusion": jax.random.PRNGKey(5)})
    assert out.shape == (b, 20, 20, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_lss_depth_topk_pruning():
    """Depth-bin pruning (bev_depth_topk, the sensor-rate lever): k = D must
    reproduce the full lift exactly (softmax already sums to 1, so the
    renormalization is a no-op), and k < D stays close when the depth
    distribution is peaked."""
    from ddp_tpu.nn.bev import LSSTransform

    kw = dict(out_channels=8, image_size=(32, 64), feature_size=(4, 8),
              xbound=(-8.0, 8.0, 0.5), ybound=(-8.0, 8.0, 0.5),
              zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0))
    b, n = 2, 2
    feats = jnp.asarray(np.random.RandomState(0).randn(b, n, 4, 8, 16),
                        jnp.float32)
    rig = _camera_rig(b, n)
    full = LSSTransform(**kw)
    variables = full.init(jax.random.PRNGKey(0), feats, *rig, train=False)
    out_full = full.apply(variables, feats, *rig, train=False)

    same = LSSTransform(**kw, depth_topk=8)  # k == D (8 bins)
    out_same = same.apply(variables, feats, *rig, train=False)
    np.testing.assert_allclose(np.asarray(out_same), np.asarray(out_full),
                               rtol=1e-4, atol=1e-5)

    pruned = LSSTransform(**kw, depth_topk=2)
    out_pruned = pruned.apply(variables, feats, *rig, train=False)
    assert out_pruned.shape == out_full.shape
    assert np.isfinite(np.asarray(out_pruned)).all()
