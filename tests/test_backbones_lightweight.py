"""Real-time backbone family shape tests (STDC/BiSeNet/FastSCNN/CGNet/
ERFNet/ICNeck — SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.nn.lightweight import (BiSeNetV1, BiSeNetV2, CGNet, ERFNet,
                                    FastSCNN, ICNeck, STDCNet)


def _run(m, size=64):
    x = jnp.ones((1, size, size, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m.apply(v, x, train=False)


def test_stdc_strides():
    outs = _run(STDCNet(base=16))
    assert [o.shape[1] for o in outs] == [8, 4, 2]
    assert all(jnp.all(jnp.isfinite(o)) for o in outs)


def test_bisenet_v1():
    fused, a16, a32 = _run(BiSeNetV1(channels=16,
                                     spatial_channels=(8, 8, 8, 16)))
    assert fused.shape[1] == 8  # 1/8
    assert fused.shape[-1] == 32


def test_bisenet_v2():
    outs = _run(BiSeNetV2(detail_channels=(8, 8, 16),
                          semantic_channels=(4, 8, 16, 32)))
    assert outs[0].shape[1] == 8  # aggregated at 1/8
    assert len(outs) == 5


def test_fast_scnn():
    fused, hi, lo = _run(FastSCNN(channels=(8, 8, 16),
                                  global_channels=(16, 16, 32)))
    assert fused.shape[1] == 8 and hi.shape[1] == 8 and lo.shape[1] == 2
    assert jnp.all(jnp.isfinite(fused))


def test_cgnet():
    outs = _run(CGNet(channels=(8, 16, 32), blocks=(2, 2)))
    assert [o.shape[1] for o in outs] == [32, 16, 8]
    # input-injection concat adds 3 channels at stages 0/1
    assert outs[0].shape[-1] == 11 and outs[1].shape[-1] == 19


def test_erfnet():
    outs = _run(ERFNet(channels=(8, 16, 32)))
    assert [o.shape[1] for o in outs] == [32, 16, 8]


def test_icneck_cff():
    ins = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
           jnp.ones((1, 4, 4, 32))]
    m = ICNeck(channels=8)
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert len(outs) == 3
    assert outs[-1].shape == (1, 16, 16, 8)


@pytest.mark.parametrize("cls,kw", [
    (STDCNet, dict(base=16)),
    (CGNet, dict(channels=(8, 16, 32), blocks=(2, 2))),
])
def test_train_mode_batchstats(cls, kw):
    x = jnp.ones((1, 32, 32, 3))
    m = cls(**kw)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    outs, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert all(jnp.all(jnp.isfinite(o)) for o in outs)
