"""Shape/behaviour tests for compat decode-head zoo part II (the remaining
inherited mmseg heads — SURVEY.md §2.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ddp_tpu.nn.compat_heads2 import (ANNHead, APCHead, CCHead, DMHead,
                                      DNLHead, EMAHead, EncHead, GCHead,
                                      ISAHead, KNetHead, PSAHead,
                                      SegmenterMaskHead, SepFCNHead, STDCHead,
                                      enc_onehot_labels,
                                      stdc_boundary_targets)

K = 7


def _pyramid(b=1, base=8):
    return [jnp.ones((b, 16, 16, base)), jnp.ones((b, 8, 8, base * 2)),
            jnp.ones((b, 4, 4, base * 4)), jnp.ones((b, 2, 2, base * 8))]


def _init_apply(head, feats, train=False):
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=False)
    if train:
        out, _ = head.apply(v, feats, train=True,
                            rngs={"dropout": jax.random.PRNGKey(2)},
                            mutable=["batch_stats"])
        return out
    return head.apply(v, feats, train=False)


@pytest.mark.parametrize("cls,kw,out_hw", [
    (ANNHead, dict(channels=16, project_channels=8,
                   key_pool_scales=(1, 3)), (2, 2)),
    (APCHead, dict(channels=16, pool_scales=(1, 2)), (2, 2)),
    (CCHead, dict(channels=16), (2, 2)),
    (DMHead, dict(channels=16, filter_sizes=(1, 3)), (2, 2)),
    (DNLHead, dict(channels=16), (2, 2)),
    (GCHead, dict(channels=16), (2, 2)),
    (ISAHead, dict(channels=16, isa_channels=8, down_factor=(2, 2)), (2, 2)),
    (PSAHead, dict(channels=16, shrink_factor=1), (2, 2)),
    (KNetHead, dict(channels=16, num_stages=2, num_heads=4), (2, 2)),
    (SegmenterMaskHead, dict(embed_dims=16, num_layers=1, num_heads=4),
     (2, 2)),
    (SepFCNHead, dict(channels=16), (2, 2)),
])
def test_head_shapes(cls, kw, out_hw):
    feats = _pyramid()
    out = _init_apply(cls(num_classes=K, **kw), feats)
    assert out.shape == (1, *out_hw, K)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ema_head_train_updates_bases():
    feats = _pyramid()
    head = EMAHead(num_classes=K, channels=16, ema_channels=16, num_bases=4,
                   num_stages=2)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=False)
    before = v["batch_stats"]["ema"]["bases"]
    rng = {"dropout": jax.random.PRNGKey(2)}
    feats_r = [jax.random.normal(jax.random.PRNGKey(i), f.shape)
               for i, f in enumerate(_pyramid())]
    out, mutated = head.apply(v, feats_r, train=True, rngs=rng,
                              mutable=["batch_stats"])
    after = mutated["batch_stats"]["ema"]["bases"]
    assert out.shape == (1, 2, 2, K)
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # momentum blend of two unit-norm sets: norms stay in (0, 1]
    # (the reference also blends without re-normalizing the buffer)
    norms = np.linalg.norm(np.asarray(after), axis=-1)
    assert np.all(norms > 0.1) and np.all(norms <= 1.0 + 1e-4)


def test_enc_head_se_logits_and_targets():
    feats = _pyramid()
    head = EncHead(num_classes=K, channels=16, num_codes=4, add_lateral=True)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=False)
    logits, se = head.apply(v, feats, train=False)
    assert logits.shape == (1, 2, 2, K)
    assert se.shape == (1, K)
    labels = jnp.asarray([[[0, 1], [255, 3]]], jnp.int32)
    onehot = enc_onehot_labels(labels, K)
    assert onehot.shape == (1, K)
    np.testing.assert_allclose(np.asarray(onehot[0, :4]), [1, 1, 0, 1])


def test_knet_all_stages_deep_supervision():
    feats = _pyramid()
    head = KNetHead(num_classes=K, channels=16, num_stages=2, num_heads=4,
                    all_stages=True)
    v = head.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, feats, train=False)
    outs = head.apply(v, feats, train=False)
    assert len(outs) == 3  # initial + 2 stages
    assert all(o.shape == (1, 2, 2, K) for o in outs)


def test_cc_attention_criss_cross_support():
    """A CC pass can only move information along the query's row+column:
    with gamma forced to 1, perturbing a pixel outside the criss-cross of a
    query must leave the query's delta at exactly its row/col pathways."""
    from ddp_tpu.nn.compat_heads2 import _CrissCrossAttention

    mod = _CrissCrossAttention(reduction=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 6, 8))
    v = mod.init(jax.random.PRNGKey(1), x)
    v = jax.tree_util.tree_map(lambda a: a, v)
    v = {"params": {**v["params"], "gamma": jnp.ones(())}}
    base = mod.apply(v, x)
    x2 = x.at[0, 3, 4].add(10.0)  # off the criss-cross of query (0, 0)
    out2 = mod.apply(v, x2)
    delta = np.abs(np.asarray(out2 - base))[0]
    # query (0,0): neither row 0 nor column 0 contains (3,4) → unchanged
    assert delta[0, 0].max() < 1e-4
    # queries sharing a row or column with (3,4) DO change
    assert delta[3, 0].max() > 1e-4
    assert delta[0, 4].max() > 1e-4


def test_stdc_boundary_targets():
    lbl = np.zeros((1, 16, 16), np.int32)
    lbl[0, :, 8:] = 1
    tgt = np.asarray(stdc_boundary_targets(jnp.asarray(lbl)))
    assert tgt.shape == (1, 16, 16)
    assert set(np.unique(tgt)) <= {0.0, 1.0}
    # boundary fires at the class transition, not deep inside a region
    # (image borders may fire too — zero padding, same as the reference)
    assert tgt[0, 8, 7:9].max() == 1.0
    assert tgt[0, 8, 3] == 0.0 and tgt[0, 8, 12] == 0.0


def test_stdc_head_single_channel():
    out = _init_apply(STDCHead(channels=16), _pyramid())
    assert out.shape == (1, 2, 2, 1)


def test_heads_grad_flow():
    """One backward pass through a representative subset."""
    feats = _pyramid()

    for cls, kw in [(CCHead, dict(channels=16)),
                    (KNetHead, dict(channels=16, num_stages=1, num_heads=4)),
                    (EMAHead, dict(channels=16, ema_channels=16, num_bases=4,
                                   num_stages=1))]:
        head = cls(num_classes=K, **kw)
        v = head.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, feats, train=False)

        def loss_fn(params):
            out = head.apply(
                {**v, "params": params}, feats, train=True,
                rngs={"dropout": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])[0]
            return jnp.sum(out ** 2)

        g = jax.grad(loss_fn)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
        assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves), cls
