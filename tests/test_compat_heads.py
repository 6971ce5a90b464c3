"""Shape/behaviour tests for the compat decode-head zoo (mmseg inheritance —
SURVEY.md §2.3 '~30 inherited mmseg heads kept for compat')."""
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.nn.compat_heads import (ASPPHead, DAHead, DPTHead,
                                     DepthwiseSeparableASPPHead, FPNHead,
                                     LRASPPHead, NLHead, OCRHead, PSPHead,
                                     SETRMLAHead, SETRUPHead, SegformerHead,
                                     UPerHead)

K = 7  # classes


def _pyramid(b=1, base=8):
    return [jnp.ones((b, 16, 16, base)), jnp.ones((b, 8, 8, base * 2)),
            jnp.ones((b, 4, 4, base * 4)), jnp.ones((b, 2, 2, base * 8))]


def _init_apply(head, feats, *extra):
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, *extra,
                  train=False)
    return head.apply(v, feats, *extra, train=False)


@pytest.mark.parametrize("cls,kw,out_hw", [
    (PSPHead, dict(channels=16), (2, 2)),
    (UPerHead, dict(channels=16), (16, 16)),
    (ASPPHead, dict(channels=16, dilations=(1, 2, 3)), (2, 2)),
    (SegformerHead, dict(channels=16), (16, 16)),
    (NLHead, dict(channels=16), (2, 2)),
    (FPNHead, dict(channels=16), (16, 16)),
    (LRASPPHead, dict(channels=16), (16, 16)),
])
def test_pyramid_heads_shapes(cls, kw, out_hw):
    feats = _pyramid()
    out = _init_apply(cls(num_classes=K, **kw), feats)
    assert out.shape == (1, *out_hw, K)
    assert jnp.all(jnp.isfinite(out))


def test_sep_aspp_head_outputs_at_c1_scale():
    feats = _pyramid()
    out = _init_apply(
        DepthwiseSeparableASPPHead(num_classes=K, channels=16, c1_channels=8,
                                   dilations=(1, 2, 3)), feats)
    assert out.shape == (1, 16, 16, K)


def test_ocr_head_cascade():
    feats = _pyramid()
    prev = jnp.zeros((1, 2, 2, K))
    out = _init_apply(OCRHead(num_classes=K, channels=16, ocr_channels=8),
                      feats, prev)
    assert out.shape == (1, 2, 2, K)


def test_da_head_aux_branches():
    feats = _pyramid()
    head = DAHead(num_classes=K, channels=16, return_aux=True)
    out, pam, cam = _init_apply(head, feats)
    assert out.shape == pam.shape == cam.shape == (1, 2, 2, K)


def test_setr_heads():
    feats = [jnp.ones((1, 4, 4, 16))] * 4
    up = _init_apply(SETRUPHead(num_classes=K, channels=8, num_convs=1,
                                up_scale=2), feats)
    assert up.shape == (1, 8, 8, K)
    mla = _init_apply(SETRMLAHead(num_classes=K, channels=8, up_scale=2),
                      feats)
    assert mla.shape == (1, 8, 8, K)


def test_dpt_head_depth_positive():
    feats = [jnp.ones((1, 4, 4, 16))] * 4
    out = _init_apply(
        DPTHead(out_channels=1, channels=16, post_channels=(8, 8, 8, 8),
                mode="depth"), feats)
    # reassemble scales (4,2,1,0.5) then fuse at finest (16) + final 2x = 32
    assert out.shape == (1, 32, 32, 1)
    assert jnp.all(out > 0)


def test_dpt_head_seg_mode():
    feats = [jnp.ones((1, 4, 4, 16))] * 4
    out = _init_apply(
        DPTHead(out_channels=K, channels=16, post_channels=(8, 8, 8, 8),
                mode="seg"), feats)
    assert out.shape == (1, 32, 32, K)


def test_heads_train_mode_with_dropout():
    feats = _pyramid()
    head = UPerHead(num_classes=K, channels=16)
    v = head.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    out = head.apply(v, feats, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)},
                     mutable=["batch_stats"])[0]
    assert out.shape == (1, 16, 16, K)


def test_point_head_refines_uncertain_points():
    """PointRend cascade head: output differs from the coarse upsample only
    at refined points; shape contract holds."""
    import jax as _jax
    import numpy as np

    from ddp_tpu.nn.compat_heads import PointHead, point_uncertainty
    from ddp_tpu.ops.resize import resize as _resize

    b, h, w, c, k = 1, 8, 8, 16, 4
    rng = np.random.RandomState(0)
    fine = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    prev = jnp.asarray(rng.randn(b, 4, 4, k), jnp.float32)
    head = PointHead(num_classes=k, fc_channels=8, num_fcs=2,
                     point_fraction=0.25)
    v = head.init({"params": _jax.random.PRNGKey(0)}, [fine], prev)
    out = head.apply(v, [fine], prev)
    assert out.shape == (b, h, w, k)
    coarse = np.asarray(_resize(prev, (h, w), mode="bilinear"))
    changed = (np.abs(np.asarray(out) - coarse).sum(-1) > 1e-6).sum()
    assert changed == int(h * w * 0.25)  # exactly K refined pixels
    # uncertainty: most-ambiguous logits get the most-negative score
    u = np.asarray(point_uncertainty(jnp.asarray(
        [[2.0, 1.9, 0.0], [5.0, 0.0, 0.0]])))
    assert u[0] > u[1]


def test_jpu_neck():
    from ddp_tpu.nn.necks import JPU

    feats = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
             jnp.ones((1, 4, 4, 32))]
    m = JPU(mid_channels=8, dilations=(1, 2))
    v = m.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = m.apply(v, feats, train=False)
    assert outs[-1].shape == (1, 16, 16, 16)  # len(dilations) * mid
