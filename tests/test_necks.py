"""Neck zoo shape/behavior tests (PSP/MultiLevel/Feature2Pyramid/Skip/HAHI)."""
import jax
import jax.numpy as jnp

import pytest

from ddp_tpu.nn.necks import (Feature2Pyramid, HAHINeck, MultiLevelNeck,
                              PSPNeck, SkipNeck)

pytestmark = pytest.mark.slow


def _pyramid(b=1, base=16):
    return [jnp.zeros((b, 32, 32, base)), jnp.zeros((b, 16, 16, base * 2)),
            jnp.zeros((b, 8, 8, base * 4)), jnp.zeros((b, 4, 4, base * 8))]


def test_psp_appends_fused_level():
    ins = _pyramid()
    m = PSPNeck(channels=32, norm="BN")
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert len(outs) == 5
    assert outs[-1].shape == (1, 4, 4, 32)  # fused PPM level
    assert outs[0].shape == ins[0].shape  # originals untouched


def test_multilevel_neck_vit_style():
    # ViT produces same-resolution taps; neck builds a pyramid
    ins = [jnp.zeros((1, 8, 8, 32))] * 4
    m = MultiLevelNeck(out_channels=16)
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert [o.shape for o in outs] == [
        (1, 4, 4, 16), (1, 8, 8, 16), (1, 16, 16, 16), (1, 32, 32, 16)]


def test_feature2pyramid():
    ins = [jnp.zeros((1, 8, 8, 32))] * 4
    m = Feature2Pyramid(embed_dim=32, norm="BN")
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]


def test_skip_neck_resizes():
    ins = _pyramid()
    m = SkipNeck(scales=(0.5, 1.0, 2.0, 4.0))
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert [o.shape[1] for o in outs] == [16, 16, 16, 16]


def test_hahi_shapes_and_interaction():
    ins = [jnp.ones((1, 32, 32, 8))] + _pyramid()
    m = HAHINeck(out_channels=(8, 16, 24, 32, 48), embedding_dim=32,
                 num_heads=4, norm="BN")
    v = m.init({"params": jax.random.PRNGKey(0)}, ins, train=False)
    outs = m.apply(v, ins, train=False)
    assert [o.shape[-1] for o in outs] == [8, 16, 24, 32, 48]
    assert outs[0].shape[1:3] == (32, 32)
