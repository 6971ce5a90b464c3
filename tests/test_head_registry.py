"""Head registry + generic EncoderDecoder (mmseg builder surface)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.nn.head_registry import HEADS, build_head

K = 5

# minimal constructor kwargs per head for a 4-level (16,8,4,2) pyramid
KW = {
    "psp": dict(channels=16),
    "uper": dict(channels=16),
    "aspp": dict(channels=16, dilations=(1, 2)),
    "sep_aspp": dict(channels=16, c1_channels=8, dilations=(1, 2)),
    "segformer": dict(channels=16),
    "ocr": dict(channels=16, ocr_channels=8),
    "da": dict(channels=16),
    "nl": dict(channels=16),
    "lraspp": dict(channels=16),
    "fpn": dict(channels=16),
    "setr_up": dict(channels=16),
    "setr_mla": dict(channels=16),
    "dpt": dict(channels=16, embed_dims=32),
    "point": dict(),
    "ann": dict(channels=16, project_channels=8, key_pool_scales=(1, 3)),
    "apc": dict(channels=16, pool_scales=(1, 2)),
    "cc": dict(channels=16),
    "dm": dict(channels=16, filter_sizes=(1, 3)),
    "dnl": dict(channels=16),
    "ema": dict(channels=16, ema_channels=16, num_bases=4, num_stages=1),
    "enc": dict(channels=16, num_codes=4),
    "gc": dict(channels=16),
    "isa": dict(channels=16, isa_channels=8, down_factor=(2, 2)),
    "knet": dict(channels=16, num_stages=1, num_heads=4),
    "psa": dict(channels=16, shrink_factor=1),
    "segmenter_mask": dict(embed_dims=16, num_layers=1, num_heads=4),
    "sep_fcn": dict(channels=16),
    "stdc": dict(channels=16),
    "fcn": dict(channels=16),
    "nn": dict(channels=16),
    "identity": dict(),
}


def test_registry_is_complete():
    assert set(KW) == set(HEADS)
    assert len(HEADS) >= 31  # the reference keeps ~30 decode heads


def test_unknown_head_raises():
    with pytest.raises(ValueError, match="unknown head"):
        build_head("nope")


@pytest.mark.parametrize("name", sorted(
    n for n in KW if n not in ("point", "dpt", "ocr", "setr_mla")))
# point/ocr take cascade args; dpt/setr_mla expect equal-res ViT taps —
# each has a dedicated test in test_compat_heads.py
def test_build_and_forward(name):
    feats = [jnp.ones((1, 16, 16, 8)), jnp.ones((1, 8, 8, 16)),
             jnp.ones((1, 4, 4, 32)), jnp.ones((1, 2, 2, 64))]
    head = build_head(name, num_classes=K, **KW[name])
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=False)
    out = head.apply(v, feats, train=False)
    if isinstance(out, tuple):  # enc: (logits, se)
        out = out[0]
    assert out.ndim == 4 and out.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(out)))


def test_generic_encoder_decoder_trains():
    """EncoderDecoder + registry head: loss + grads, tuple-output (enc)."""
    from flax import linen as nn

    from ddp_tpu.models.compat_segmentor import EncoderDecoder

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            outs = []
            for i, c in enumerate((8, 16)):
                x = nn.Conv(c, (3, 3), strides=(2, 2), name=f"c{i}")(x)
                x = nn.relu(x)
                outs.append(x)
            return tuple(outs)

    for head_name, kw in [("psp", dict(channels=16)),
                          ("enc", dict(channels=16, num_codes=4))]:
        model = EncoderDecoder(backbone=TinyBackbone(), head_name=head_name,
                               num_classes=K, head_kwargs=kw)
        img = jnp.ones((2, 16, 16, 3))
        gt = jnp.zeros((2, 16, 16), jnp.int32)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, img, gt,
                       train=False)

        def loss_fn(params):
            (loss, logs), _ = model.apply(
                {**v, "params": params}, img, gt, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return loss

        loss, g = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)
        pred = model.apply(v, img, method=model.predict)
        assert pred.shape == (2, 16, 16)
