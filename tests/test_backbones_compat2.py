"""Compat backbone zoo II shape tests (MobileNetV2/V3, HRNet, UNet, ResNeSt —
SURVEY.md §2.3 mmseg-inherited backbones)."""
import jax
import jax.numpy as jnp

import pytest

from ddp_tpu.nn.mobile_hrnet import (HRNet, MobileNetV2, MobileNetV3, ResNeSt,
                                     UNetBackbone)

pytestmark = pytest.mark.slow


def _run(m, size=32):
    x = jnp.ones((1, size, size, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m.apply(v, x, train=False)


def test_mobilenet_v2_strides():
    outs = _run(MobileNetV2())
    # taps at stages 1,2,4,6 → strides 4, 8, 8(d=1 stage4 keeps 16? no: s=2
    # at stage3 → 16, stages 5-6 dilated keep 16): 8, 16(?) — verify shapes
    assert [o.shape[1] for o in outs] == [8, 4, 2, 2]
    assert [o.shape[-1] for o in outs] == [24, 32, 96, 320]


def test_mobilenet_v3_large_and_small():
    for arch, n_expected in (("large", 3), ("small", 3)):
        outs = _run(MobileNetV3(arch=arch))
        assert len(outs) == n_expected
        assert all(jnp.all(jnp.isfinite(o)) for o in outs)


def test_hrnet_four_branches():
    outs = _run(HRNet(widths=(8, 16, 32, 64), blocks_per_stage=1,
                      stage_modules=(1, 1, 1)))
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1]
    assert [o.shape[-1] for o in outs] == [8, 16, 32, 64]


def test_unet_decoder_pyramid():
    outs = _run(UNetBackbone(base_channels=4, num_stages=4))
    # coarsest→finest decoder taps
    assert [o.shape[1] for o in outs] == [4, 8, 16, 32]
    assert outs[-1].shape[-1] == 4


def test_resnest_split_attention():
    outs = _run(ResNeSt(depth=50, base_channels=8, out_indices=(0, 1, 2, 3)))
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1]
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]
    assert all(jnp.all(jnp.isfinite(o)) for o in outs)
