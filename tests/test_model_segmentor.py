"""Forward smoke tests for DDPSegmentor — the reference's test_forward.py
pattern (random inputs through real configs) done natively (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.models.segmentor import DDPSegmentor

TINY = dict(
    num_classes=11,
    backbone_type="swin",
    backbone_variant="nano",
    embed_dims=32,
    decoder_layers=2,
    decoder_heads=4,
    decoder_ffn_dim=64,
    diffusion=DiffusionConfig(timesteps=2, randsteps=1),
    drop_path_rate=0.0,
)
HW = 32


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = DDPSegmentor(**TINY)
    img = jnp.zeros((1, HW, HW, 3))
    gt = jnp.zeros((1, HW, HW), jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img, gt, train=False,
    )
    return model, params


def test_train_loss_finite(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img = jnp.asarray(np.random.randn(2, HW, HW, 3), jnp.float32)
    gt = jnp.asarray(np.random.randint(0, 11, (2, HW, HW)), jnp.int32)
    gt = gt.at[:, :4].set(255)  # exercise ignore label
    (loss, logs), _ = model.apply(
        variables, img, gt, train=True,
        rngs={"diffusion": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss))
    assert set(logs) >= {"decode.loss_ce", "aux.loss_ce", "decode.acc_seg"}
    assert float(logs["aux.loss_ce"]) >= 0


def test_sample_shapes_and_probs(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img = jnp.asarray(np.random.randn(1, HW, HW, 3), jnp.float32)
    out = model.apply(
        variables, img, method=model.sample,
        rngs={"diffusion": jax.random.PRNGKey(5)},
    )
    assert out.shape == (1, HW, HW, 11)
    # accumulation=True -> probability maps
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-4)


def test_gradients_nonzero(tiny_model_and_params):
    model, variables = tiny_model_and_params
    img = jnp.asarray(np.random.randn(1, HW, HW, 3), jnp.float32)
    gt = jnp.asarray(np.random.randint(0, 11, (1, HW, HW)), jnp.int32)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        (loss, _), _ = model.apply(
            {"params": p, **rest}, img, gt, train=True,
            rngs={"diffusion": jax.random.PRNGKey(6), "dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        return loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in leaves]
    assert all(np.isfinite(norms))
    assert max(norms) > 0
    # time-FiLM path must receive gradient (the FiLM scale/shift dense layers)
    enc = grads["decode_head"]["encoder"]
    assert float(jnp.abs(enc["layer0"]["time_mlp"]["kernel"]).max()) > 0


def test_self_aligned_forward_and_grad():
    """SelfAlignedDDP path executed for real (VERDICT r1 weak #4): the
    two-stage forward (no-grad t=1 prediction -> re-embed -> corrupt) must
    produce a finite loss and nonzero grads wrt the embedding table."""
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    m = DDPSegmentor(num_classes=5, backbone_type="convnext",
                     backbone_variant="nano", embed_dims=32,
                     decoder_layers=1, decoder_heads=4, decoder_ffn_dim=64,
                     drop_path_rate=0.0, self_aligned=True,
                     diffusion=DiffusionConfig(timesteps=2))
    img = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                      jnp.float32)
    gt = jnp.asarray(np.random.RandomState(1).randint(0, 5, (2, 32, 32)),
                     jnp.int32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "diffusion": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}, img, gt, train=False)

    def loss_fn(p):
        loss, _ = m.apply(
            {"params": p, "batch_stats": v.get("batch_stats", {})},
            img, gt, train=False,
            rngs={"diffusion": jax.random.PRNGKey(3)})
        return loss

    loss = float(loss_fn(v["params"]))
    assert np.isfinite(loss)
    g = jax.grad(loss_fn)(v["params"])
    g_table = np.asarray(g["embedding_table"]["embedding"])
    assert np.isfinite(g_table).all()
    # stage-1 prediction is stop-gradient'ed, but stage-2 re-embedding keeps
    # the table in the graph -> nonzero gradient
    assert np.abs(g_table).sum() > 0
