"""Lidar-branch + BEVFusion-backbone coverage (SURVEY §2.3 #34): SECOND,
SECONDFPN, PointPillars encoder/scatter, DLA, VoVNet."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _run(m, x, **kw):
    v = m.init({"params": jax.random.PRNGKey(0)}, x, **kw, train=False)
    return m.apply(v, x, **kw, train=False)


def test_second_strides_and_channels():
    from ddp_tpu.nn.second import SECOND

    m = SECOND(out_channels=(16, 32, 64), layer_nums=(1, 1, 1),
               layer_strides=(2, 2, 2))
    outs = _run(m, jnp.ones((1, 32, 32, 8)))
    assert [o.shape[1] for o in outs] == [16, 8, 4]
    assert [o.shape[-1] for o in outs] == [16, 32, 64]


def test_secondfpn_concat():
    from ddp_tpu.nn.second import SECOND, SECONDFPN

    bb = SECOND(out_channels=(16, 32, 64), layer_nums=(1, 1, 1))
    x = jnp.ones((1, 32, 32, 8))
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = bb.apply(v, x, train=False)
    neck = SECONDFPN(out_channels=(32, 32, 32), upsample_strides=(1, 2, 4))
    v2 = neck.init({"params": jax.random.PRNGKey(1)}, feats, train=False)
    out = neck.apply(v2, feats, train=False)
    assert out.shape == (1, 16, 16, 96)


def test_pillar_feature_net_and_scatter():
    from ddp_tpu.nn.second import (PillarFeatureNet, point_pillars_scatter)

    b, p, n = 2, 16, 8
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, p, n, 4), jnp.float32)
    counts = jnp.asarray(rng.randint(0, n + 1, (b, p)), jnp.int32)
    coords = jnp.asarray(rng.randint(0, 10, (b, p, 2)), jnp.int32)
    m = PillarFeatureNet(feat_channels=(16, 32), voxel_size=(0.5, 0.5),
                         pc_range=(0.0, -2.5))
    v = m.init({"params": jax.random.PRNGKey(0)}, feats, counts, coords,
               train=False)
    pf = m.apply(v, feats, counts, coords, train=False)
    assert pf.shape == (b, p, 32)
    assert np.isfinite(np.asarray(pf)).all()
    canvas = point_pillars_scatter(pf, coords, counts > 0, nx=10, ny=10)
    assert canvas.shape == (b, 10, 10, 32)
    # empty pillars contribute nothing
    empty = np.asarray(counts) == 0
    assert np.isfinite(np.asarray(canvas)).all()


def test_pillar_scatter_grad():
    from ddp_tpu.nn.second import point_pillars_scatter

    pf = jnp.ones((1, 4, 8))
    coords = jnp.asarray([[[0, 0], [1, 1], [2, 2], [3, 3]]], jnp.int32)
    valid = jnp.asarray([[True, True, False, True]])
    g = jax.grad(lambda f: jnp.sum(
        point_pillars_scatter(f, coords, valid, 4, 4) ** 2))(pf)
    assert float(jnp.abs(g[0, 2]).sum()) == 0.0  # invalid pillar: no grad
    assert float(jnp.abs(g[0, 0]).sum()) > 0


def test_dla34_stages():
    from ddp_tpu.nn.dla_vovnet import DLA

    m = DLA(levels=(1, 1, 1, 2, 2, 1), channels=(4, 8, 16, 32, 64, 128))
    outs = _run(m, jnp.ones((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [16, 32, 64, 128]


def test_vovnet_stages():
    from ddp_tpu.nn.dla_vovnet import VoVNet

    m = VoVNet(stage_ch=(8, 8, 16, 16), concat_ch=(16, 32, 64, 128),
               blocks=(1, 1, 1, 1), osa_layers=2)
    outs = _run(m, jnp.ones((1, 64, 64, 3)))
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]
    assert [o.shape[-1] for o in outs] == [16, 32, 64, 128]
