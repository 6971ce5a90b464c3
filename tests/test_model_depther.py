"""Forward/training tests for the DDPDepther (depth task)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.core.schedules import cosine_gamma
from ddp_tpu.models.depther import DDPDepther

HW = 32
TINY = dict(
    backbone_type="convnext",
    backbone_variant="nano",
    embed_dims=32,
    decoder_layers=2,
    decoder_heads=4,
    decoder_ffn_dim=64,
    diffusion=DiffusionConfig(timesteps=2, accumulation=False),
    drop_path_rate=0.0,
    max_depth=10.0,
)


@pytest.fixture(scope="module")
def depther():
    model = DDPDepther(**TINY)
    img = jnp.zeros((1, HW, HW, 3))
    gt = jnp.ones((1, HW, HW)) * 5.0
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        img, gt, train=False,
    )
    return model, variables


def test_depth_train_loss_finite(depther):
    model, variables = depther
    img = jnp.asarray(np.random.randn(2, HW, HW, 3), jnp.float32)
    gt = jnp.asarray(np.random.uniform(0.5, 9.5, (2, HW, HW)), jnp.float32)
    gt = gt.at[:, :3].set(0.0)  # invalid region must be masked by SigLoss
    (loss, logs), _ = model.apply(
        variables, img, gt, train=True,
        rngs={"diffusion": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_depth_sample_range(depther):
    model, variables = depther
    img = jnp.asarray(np.random.randn(1, HW, HW, 3), jnp.float32)
    out = model.apply(variables, img, method=model.sample,
                      rngs={"diffusion": jax.random.PRNGKey(5)})
    assert out.shape == (1, HW, HW)
    o = np.asarray(out)
    assert (o >= TINY["max_depth"] * 0 + 1e-3 - 1e-9).all()
    assert (o <= TINY["max_depth"] + 1e-6).all()


def test_depth_time_grid_no_sample_range():
    model = DDPDepther(**TINY)
    pairs = model._time_pairs()
    # T=2, td=1: (1, 0), (0.5, 0) — no 0.999 clamp (ddp.py:213-221)
    np.testing.assert_allclose(pairs, [[1.0, 0.0], [0.5, 0.0]], atol=1e-7)


def test_gamma_corruption_endpoints():
    # gamma(0) ~ 1 (no noise), gamma(1) ~ 0 (pure noise)
    assert float(cosine_gamma(jnp.float32(0.0))) > 0.999
    assert float(cosine_gamma(jnp.float32(1.0))) < 1e-3


def test_depth_overfit_small():
    """A few steps of training should reduce loss on a fixed batch."""
    import optax

    model = DDPDepther(**TINY)
    rngk = np.random.RandomState(0)
    img = jnp.asarray(rngk.randn(4, HW, HW, 3), jnp.float32)
    yy = np.mgrid[0:HW, 0:HW][0].astype(np.float32)
    gt = jnp.asarray(np.tile((1.0 + 8.0 * yy / HW)[None], (4, 1, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img[:1], gt[:1], train=False)
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            (l, _), _ = model.apply({"params": p}, img, gt, train=True,
                                    rngs={"diffusion": rng,
                                          "dropout": jax.random.PRNGKey(4)},
                                    mutable=["batch_stats"])
            return l

        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, l

    losses = []
    for i in range(30):
        params, opt, l = step(params, opt, jax.random.PRNGKey(100 + i))
        losses.append(float(l))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8
