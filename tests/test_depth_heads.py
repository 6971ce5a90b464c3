"""Depth head zoo + DepthLSS fusion transform + window-attention decoder."""
import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.nn.depth_heads import AdabinsHead, DenseDepthHead
import pytest

pytestmark = pytest.mark.slow


def _feats():
    return [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
            jnp.ones((1, 4, 4, 32)), jnp.ones((1, 2, 2, 48))]


def test_densedepth_range():
    m = DenseDepthHead(up_sample_channels=(8, 16, 32, 48), max_depth=10.0)
    v = m.init({"params": jax.random.PRNGKey(0)}, _feats(), train=False)
    d = m.apply(v, _feats(), train=False)
    assert d.shape == (1, 16, 16, 1)
    assert float(d.min()) >= 0.0 and float(d.max()) <= 10.0


def test_adabins_bins_and_depth():
    m = AdabinsHead(up_sample_channels=(8, 16, 32, 48), n_bins=16,
                    n_query_channels=4, embedding_dim=16, patch_size=4,
                    max_depth=8.0, min_depth=0.1)
    v = m.init({"params": jax.random.PRNGKey(0)}, _feats(), train=False)
    d, edges = m.apply(v, _feats(), train=False)
    assert d.shape == (1, 16, 16, 1) and edges.shape == (1, 17)
    e = np.asarray(edges)[0]
    assert abs(e[0] - 0.1) < 1e-5 and abs(e[-1] - 8.0) < 1e-3
    assert (np.diff(e) > 0).all()  # monotone bin edges
    assert 0.1 <= float(d.mean()) <= 8.0


def test_depth_lss_transform():
    from ddp_tpu.nn.bev import DepthLSSTransform

    b, n = 1, 2
    m = DepthLSSTransform(out_channels=8, image_size=(32, 64),
                          feature_size=(4, 8),
                          xbound=(-8, 8, 1.0), ybound=(-8, 8, 1.0),
                          zbound=(-5, 5, 10.0), dbound=(1.0, 9.0, 1.0),
                          downsample=1)
    feats = jnp.ones((b, n, 4, 8, 6))
    canvas = jnp.zeros((b, n, 32, 64, 1))
    eye = jnp.tile(jnp.eye(3)[None, None], (b, n, 1, 1))
    intr = jnp.tile(jnp.asarray([[20.0, 0, 32], [0, 20.0, 16], [0, 0, 1]])[None, None],
                    (b, n, 1, 1))
    trans = jnp.zeros((b, n, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, feats, canvas, eye, trans,
               intr, eye, trans, train=False)
    out = m.apply(v, feats, canvas, eye, trans, intr, eye, trans, train=False,
                  mutable=["batch_stats"])[0]
    assert out.shape == (b, 16, 16, 8)


def test_rasterize_lidar_depth():
    from ddp_tpu.data.bev_datasets import rasterize_lidar_depth

    pts = np.array([[0.0, 0.0, 5.0, 0.0], [0.0, 0.0, 2.0, 0.0]], np.float32)
    rot = np.tile(np.eye(3, dtype=np.float32)[None], (1, 1, 1))
    trans = np.zeros((1, 3), np.float32)
    intr = np.array([[[20.0, 0, 16], [0, 20.0, 8], [0, 0, 1]]], np.float32)
    post_rot = rot.copy()
    post_trans = trans.copy()
    canvas = rasterize_lidar_depth(pts, rot, trans, intr, post_rot, post_trans,
                                   (16, 32))
    assert canvas.shape == (1, 16, 32, 1)
    # both points hit the same pixel (principal point); nearest (2.0) wins
    assert abs(float(canvas[0, 8, 16, 0]) - 2.0) < 1e-5
    assert float(canvas.max()) == float(canvas[0, 8, 16, 0])


def test_window_attention_decoder_variant():
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    m = DDPSegmentor(num_classes=5, backbone_type="swin",
                     backbone_variant="nano", embed_dims=32, decoder_layers=2,
                     decoder_ffn_dim=64, decoder_heads=4,
                     decoder_attn="window",
                     diffusion=DiffusionConfig(timesteps=2),
                     drop_path_rate=0.0)
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, img, gt, train=False)
    loss, logs = m.apply(v, img, gt, train=False,
                         rngs={"diffusion": jax.random.PRNGKey(3)})
    out = m.apply(v, img, method=m.sample,
                  rngs={"diffusion": jax.random.PRNGKey(4)})
    assert out.shape == (1, 32, 32, 5)
    assert np.isfinite(float(loss))


def _pyr(b=1, base=16):
    return [jnp.ones((b, 16, 16, base)), jnp.ones((b, 8, 8, base * 2)),
            jnp.ones((b, 4, 4, base * 4)), jnp.ones((b, 2, 2, base * 8))]


def test_bts_head_lpg():
    from ddp_tpu.nn.depth_heads import BTSHead, local_planar_guidance

    m = BTSHead(max_depth=10.0, channels=16)
    v = m.init({"params": jax.random.PRNGKey(0)}, _pyr(), train=False)
    d = m.apply(v, _pyr(), train=False)
    assert d.shape == (1, 16, 16, 1)
    assert float(d.min()) >= 1e-3 and float(d.max()) <= 10.0
    # LPG of a fronto-parallel plane (n=(0,0,1), dist=2) is constant 2
    pe = jnp.zeros((1, 2, 2, 4)).at[..., 2].set(1.0).at[..., 3].set(2.0)
    out = local_planar_guidance(pe, 4)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)


def test_newcrf_head():
    from ddp_tpu.nn.depth_heads import NeWCRFHead

    m = NeWCRFHead(max_depth=10.0, channels=16)
    v = m.init({"params": jax.random.PRNGKey(0)}, _pyr(), train=False)
    d = m.apply(v, _pyr(), train=False)
    assert d.shape == (1, 16, 16, 1)
    assert np.isfinite(np.asarray(d)).all()


def test_binsformer_head():
    from ddp_tpu.nn.depth_heads import BinsFormerHead

    m = BinsFormerHead(max_depth=10.0, n_bins=8, channels=16, dec_layers=1)
    v = m.init({"params": jax.random.PRNGKey(0)}, _pyr(), train=False)
    d = m.apply(v, _pyr(), train=False)
    assert d.shape == (1, 16, 16, 1)
    dd = np.asarray(d)
    assert (dd >= 1e-3).all() and (dd <= 10.0).all()
