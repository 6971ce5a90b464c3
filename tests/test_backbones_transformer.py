"""Compat backbone zoo III shape tests (Twins PCPVT/SVT, BEiT, EfficientNet —
SURVEY.md §2.3 mmseg twins/beit/mae + depth efficientnet)."""
import jax
import jax.numpy as jnp
import numpy as np

import pytest

from ddp_tpu.nn.transformer_backbones import (BEiT, EfficientNet,
                                              LocallyGroupedAttention, Twins)

pytestmark = pytest.mark.slow


def _run(m, size=32):
    x = jnp.ones((1, size, size, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m.apply(v, x, train=False)


def test_twins_pcpvt_strides():
    m = Twins(dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
              num_heads=(1, 2, 4, 8), svt=False)
    outs = _run(m)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1]
    assert [o.shape[-1] for o in outs] == [16, 32, 64, 128]


def test_twins_svt_alternating():
    m = Twins(dims=(16, 32, 64, 128), depths=(2, 2, 2, 2),
              num_heads=(1, 2, 4, 8), svt=True, window_size=2)
    outs = _run(m)
    assert [o.shape[1] for o in outs] == [8, 4, 2, 1]
    assert all(jnp.all(jnp.isfinite(o)) for o in outs)


def test_lsa_pad_mask_matches_unpadded():
    """Valid-token outputs must be identical whether or not the input needs
    window padding — guards the -1000 pad-key mask (ref twins.py LSA)."""
    m = LocallyGroupedAttention(dim=8, num_heads=2, window_size=4)
    rng = jax.random.PRNGKey(0)
    x6 = jax.random.normal(jax.random.PRNGKey(1), (1, 6 * 6, 8))
    v = m.init({"params": rng}, x6, (6, 6))  # 6 % 4 != 0 → padding path
    out_pad = m.apply(v, x6, (6, 6))
    # reference: run each 4x4-clipped window region without padding. The
    # top-left 4x4 window of the padded run attends only to valid tokens, so
    # it must equal a direct 4x4 run with the same params.
    x4 = x6.reshape(1, 6, 6, 8)[:, :4, :4].reshape(1, 16, 8)
    out_ref = m.apply(v, x4, (4, 4))
    got = out_pad.reshape(1, 6, 6, 8)[:, :4, :4].reshape(1, 16, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_beit_taps():
    m = BEiT(embed_dim=32, depth=4, num_heads=4, patch_size=8,
             out_indices=(1, 3))
    outs = _run(m)
    assert len(outs) == 2
    assert outs[0].shape == (1, 4, 4, 32)


def test_efficientnet_b0_strides():
    outs = _run(EfficientNet(), size=64)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert [o.shape[-1] for o in outs] == [24, 40, 112, 320]
    assert all(jnp.all(jnp.isfinite(o)) for o in outs)


def test_mobilenet_v3_dilated_os8():
    """Seg conversion: the last TWO downsampling blocks destrided → final tap
    at output stride 8, not 32 (mmseg mobilenet_v3.py:199-241)."""
    from ddp_tpu.nn.mobile_hrnet import MobileNetV3

    for arch in ("large", "small"):
        m = MobileNetV3(arch=arch)
        x = jnp.ones((1, 64, 64, 3))
        v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs = m.apply(v, x, train=False)
        assert outs[-1].shape[1] == 8, (arch, outs[-1].shape)  # 64/8
        m32 = MobileNetV3(arch=arch, dilated=False)
        v32 = m32.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs32 = m32.apply(v32, x, train=False)
        assert outs32[-1].shape[1] == 2  # 64/32 classifier layout
