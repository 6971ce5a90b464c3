"""Gradient microbatching (make_train_step(microbatch=k)) — the training-
side analog of the inference program split (evaluation/batched.py): equal
chunks scanned inside one jitted step, gradients averaged.
"""
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ddp_tpu.train.optim import OptimConfig, make_optimizer
from ddp_tpu.train.state import TrainState, make_train_step


class ToyModel(nn.Module):
    """rng-free model: microbatched grads must EXACTLY equal full-batch."""

    @nn.compact
    def __call__(self, image, label, train=True):
        h = nn.Dense(8)(image.reshape(image.shape[0], -1))
        pred = nn.Dense(1)(nn.tanh(h))[:, 0]
        loss = jnp.mean((pred - label) ** 2)
        return loss, {"loss": loss}


def _setup(microbatch):
    model = ToyModel()
    img = jnp.zeros((1, 4, 4, 3))
    lab = jnp.zeros((1,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img, lab)
    tx = make_optimizer(OptimConfig(lr=1e-2, total_steps=10, warmup_steps=0),
                        variables["params"])
    state = TrainState.create(variables["params"], tx, {},
                              jax.random.PRNGKey(3))
    step = make_train_step(model, tx, mesh=None, donate=False,
                           microbatch=microbatch)
    return state, step


def test_microbatch_matches_full_batch_exactly():
    rng = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rng.randn(8, 4, 4, 3), jnp.float32),
             "label": jnp.asarray(rng.randn(8), jnp.float32)}
    s1, step1 = _setup(1)
    s2, step2 = _setup(2)
    s4, step4 = _setup(4)
    n1, l1 = step1(s1, batch)
    n2, l2 = step2(s2, batch)
    n4, l4 = step4(s4, batch)
    # rng-free toy: loss and updated params identical across chunkings
    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(l1["grad_norm"]), float(l2["grad_norm"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(n1.params),
                    jax.tree_util.tree_leaves(n4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_microbatch_real_model_trains():
    """DDPSegmentor at microbatch=2: loss finite and falls on an overfit."""
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    model = DDPSegmentor(
        num_classes=4, backbone_type="convnext", backbone_variant="nano",
        embed_dims=32, decoder_layers=1, decoder_heads=4, decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=2), drop_path_rate=0.0,
        decoder_attn="window")
    rng = np.random.RandomState(0)
    lab = np.zeros((4, 32, 32), np.int32)
    lab[:, 16:, :] += 2
    lab[:, :, 16:] += 1
    colors = np.array([[2, 0, 0], [0, 2, 0], [0, 0, 2], [2, 2, 0]],
                      np.float32)
    img = colors[lab] + rng.randn(4, 32, 32, 3).astype(np.float32) * 0.2
    batch = {"image": jnp.asarray(img), "label": jnp.asarray(lab)}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["label"][:1], train=False)
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=100, warmup_steps=0),
                        variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}),
                              jax.random.PRNGKey(3))
    step = make_train_step(model, tx, mesh=None, donate=False, microbatch=2,
                           mixed_precision=True)
    first = None
    for i in range(30):
        state, logs = step(state, batch)
        if first is None:
            first = float(logs["loss"])
    last = float(logs["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
