"""Uncertainty-map tests (VERDICT r3 missing #6 / BASELINE config #3).

The reference's randsteps machinery (ddp.py:219,241-245) runs r independent
rollouts; `sample_with_uncertainty` surfaces their disagreement instead of
averaging it away.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core.diffusion import DiffusionConfig
from ddp_tpu.models.segmentor import DDPSegmentor


def tiny_model(randsteps):
    return DDPSegmentor(
        num_classes=4, backbone_type="convnext", backbone_variant="nano",
        embed_dims=32, decoder_layers=2, decoder_heads=4, decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=3, randsteps=randsteps,
                                  accumulation=False),
        drop_path_rate=0.0)


def quadrant_batch(n=4, hw=32, noise=0.3, seed=0):
    """Labels = quadrant index, images = per-quadrant color + noise: the
    label is fully observable from the image, so an overfit model is
    near-deterministic on clean inputs."""
    rng = np.random.RandomState(seed)
    lab = np.zeros((n, hw, hw), np.int32)
    lab[:, hw // 2:, :] += 2
    lab[:, :, hw // 2:] += 1
    img = np.zeros((n, hw, hw, 3), np.float32)
    colors = np.array([[2, 0, 0], [0, 2, 0], [0, 0, 2], [2, 2, 0]],
                      np.float32)
    img = colors[lab]
    img = img + rng.randn(*img.shape).astype(np.float32) * noise
    return {"image": jnp.asarray(img), "label": jnp.asarray(lab)}


def _init(model, batch):
    return model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["label"][:1], train=False)


def test_uncertainty_shapes_and_r1_zero_variance():
    batch = quadrant_batch(2)
    m1 = tiny_model(randsteps=1)
    v1 = _init(m1, batch)
    probs, unc = m1.apply(v1, batch["image"],
                          method=m1.sample_with_uncertainty,
                          rngs={"diffusion": jax.random.PRNGKey(5)})
    assert probs.shape == (2, 32, 32, 4)
    assert unc["variance"].shape == (2, 32, 32)
    assert unc["entropy"].shape == (2, 32, 32)
    # one hypothesis -> zero disagreement
    assert float(jnp.abs(unc["variance"]).max()) < 1e-12
    # entropy of a 4-class distribution is bounded by ln 4
    assert float(unc["entropy"].max()) <= np.log(4) + 1e-4
    assert float(unc["entropy"].min()) >= 0.0
    # probs are a simplex
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)

    m4 = tiny_model(randsteps=4)
    probs4, unc4 = m4.apply(_init(m4, batch), batch["image"],
                            method=m4.sample_with_uncertainty,
                            rngs={"diffusion": jax.random.PRNGKey(5)})
    # independent hypotheses of a random-init model disagree
    assert float(unc4["variance"].mean()) > 1e-8


@pytest.mark.slow
def test_uncertainty_higher_on_corrupted_pixels():
    """Overfit the quadrant task, then destroy the right half of the input:
    the ensemble must disagree (higher variance) exactly where the evidence
    was destroyed."""
    from ddp_tpu.train.optim import OptimConfig, make_optimizer
    from ddp_tpu.train.state import TrainState, make_train_step

    model = tiny_model(randsteps=6)
    batch = quadrant_batch(4)
    variables = _init(model, batch)
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=200, warmup_steps=0),
                        variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}),
                              jax.random.PRNGKey(3))
    step = make_train_step(model, tx, mesh=None, donate=False)
    loss = None
    for _ in range(150):
        state, logs = step(state, batch)
        loss = float(logs["loss"])
    assert loss < 0.2, f"overfit failed, loss {loss}"

    vars2 = {"params": state.params}
    if state.batch_stats:
        vars2["batch_stats"] = state.batch_stats

    img = np.asarray(batch["image"][:1]).copy()
    corrupted = img.copy()
    rng = np.random.RandomState(1)
    corrupted[:, :, 16:, :] = rng.randn(1, 32, 16, 3) * 3.0

    @jax.jit
    def unc_of(img):
        _, unc = model.apply(vars2, jnp.asarray(img),
                             method=model.sample_with_uncertainty,
                             rngs={"diffusion": jax.random.PRNGKey(7)})
        return unc

    clean = unc_of(img)
    corr = unc_of(corrupted)
    var_clean_right = float(np.asarray(clean["variance"])[:, :, 16:].mean())
    var_corr_right = float(np.asarray(corr["variance"])[:, :, 16:].mean())
    ent_clean_right = float(np.asarray(clean["entropy"])[:, :, 16:].mean())
    ent_corr_right = float(np.asarray(corr["entropy"])[:, :, 16:].mean())
    # destroying the evidence must raise BOTH disagreement and entropy there
    assert var_corr_right > 2.0 * max(var_clean_right, 1e-9), (
        var_clean_right, var_corr_right)
    assert ent_corr_right > ent_clean_right
    # and the untouched left half stays comparatively certain
    var_corr_left = float(np.asarray(corr["variance"])[:, :, :16].mean())
    assert var_corr_right > var_corr_left
