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


# --- depth (VERDICT r4 missing #3: BASELINE config #3 names depth) ---------

def tiny_depther(randsteps):
    from ddp_tpu.models.depther import DDPDepther

    return DDPDepther(
        backbone_type="convnext", backbone_variant="nano", embed_dims=32,
        decoder_layers=2, decoder_heads=4, decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=2, randsteps=randsteps,
                                  accumulation=False),
        drop_path_rate=0.0, max_depth=10.0)


def test_depth_uncertainty_shapes_and_r1_zero_std():
    hw = 32
    img = jnp.asarray(np.random.RandomState(0).randn(2, hw, hw, 3),
                      jnp.float32)
    gt = jnp.ones((2, hw, hw)) * 5.0

    m1 = tiny_depther(randsteps=1)
    v1 = m1.init({"params": jax.random.PRNGKey(0),
                  "diffusion": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, img[:1], gt[:1],
                 train=False)
    depth, unc = m1.apply(v1, img, method=m1.sample_with_uncertainty,
                          rngs={"diffusion": jax.random.PRNGKey(5)})
    assert depth.shape == (2, hw, hw)
    for k in ("std", "interval_low", "interval_high"):
        assert unc[k].shape == (2, hw, hw)
    # one hypothesis -> zero spread, degenerate interval
    assert float(jnp.abs(unc["std"]).max()) < 1e-6
    np.testing.assert_allclose(np.asarray(unc["interval_low"]),
                               np.asarray(unc["interval_high"]), atol=1e-5)
    # metric-depth outputs respect the model's range
    assert float(depth.min()) >= 0.0
    assert float(depth.max()) <= 10.0 + 1e-5

    m4 = tiny_depther(randsteps=4)
    v4 = m4.init({"params": jax.random.PRNGKey(0),
                  "diffusion": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, img[:1], gt[:1],
                 train=False)
    depth4, unc4 = m4.apply(v4, img, method=m4.sample_with_uncertainty,
                            rngs={"diffusion": jax.random.PRNGKey(5)})
    # independent hypotheses of a random-init model disagree in metric units
    assert float(unc4["std"].mean()) > 1e-6
    # the 80% interval brackets: low <= high, with positive width somewhere
    assert float((unc4["interval_high"] - unc4["interval_low"]).min()) >= -1e-5
    assert float((unc4["interval_high"] - unc4["interval_low"]).max()) > 1e-6
    # mean prediction equals sample() under the same rng stream
    depth_plain = m4.apply(v4, img, method=m4.sample,
                           rngs={"diffusion": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(np.asarray(depth4), np.asarray(depth_plain),
                               atol=1e-5)


# --- BEV (per-class mask variance over the randsteps ensemble) -------------

def _bev_rig(b=1, n=2):
    rng = np.random.RandomState(0)
    intr = np.zeros((b, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 40.0
    intr[..., 0, 2] = 31.5
    intr[..., 1, 2] = 15.5
    intr[..., 2, 2] = 1.0
    rots = np.zeros((b, n, 3, 3), np.float32)
    for i in range(n):
        ang = 2 * np.pi * i / n
        c, s = np.cos(ang), np.sin(ang)
        rz = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        look = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32).T
        rots[:, i] = rz @ look
    trans = rng.uniform(-0.5, 0.5, (b, n, 3)).astype(np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    zero = np.zeros((b, n, 3), np.float32)
    return (jnp.asarray(rots), jnp.asarray(trans), jnp.asarray(intr),
            jnp.asarray(eye), jnp.asarray(zero))


def tiny_bev(randsteps):
    from ddp_tpu.models.bev import DDPBEVCamera

    return DDPBEVCamera(
        num_classes=3, embed_dims=32, backbone_variant="nano",
        image_size=(32, 64), out_grid=20,
        input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
        output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
        xbound=(-8.0, 8.0, 0.5), ybound=(-8.0, 8.0, 0.5),
        zbound=(-10.0, 10.0, 20.0), dbound=(1.0, 9.0, 1.0),
        lss_out_channels=16, bev_blocks=((1, 24, 2), (1, 32, 1)),
        decoder_layers=1, decoder_heads=4, decoder_ffn_dim=64,
        diffusion=DiffusionConfig(timesteps=2, randsteps=randsteps),
        drop_path_rate=0.0)


@pytest.mark.slow
def test_bev_uncertainty_shapes_and_r1_zero_variance():
    b, n = 1, 2
    rig = _bev_rig(b, n)
    img = jnp.asarray(np.random.RandomState(1).randn(b, n, 32, 64, 3),
                      jnp.float32)
    gt = jnp.zeros((b, 20, 20, 3), jnp.int32)

    m1 = tiny_bev(randsteps=1)
    v1 = m1.init({"params": jax.random.PRNGKey(0),
                  "diffusion": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, img, *rig, gt,
                 train=False)
    scores, unc = m1.apply(v1, img, *rig,
                           method=m1.sample_with_uncertainty,
                           rngs={"diffusion": jax.random.PRNGKey(5)})
    assert scores.shape == (b, 20, 20, 3)
    assert unc["variance"].shape == (b, 20, 20)
    assert unc["entropy"].shape == (b, 20, 20)
    assert float(jnp.abs(unc["variance"]).max()) < 1e-12
    # Bernoulli entropy bounded by ln 2
    assert float(unc["entropy"].max()) <= np.log(2) + 1e-4
    # scores agree with plain sample() under the same rng stream
    plain = m1.apply(v1, img, *rig, method=m1.sample,
                     rngs={"diffusion": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(np.asarray(scores), np.asarray(plain),
                               atol=1e-5)

    m3 = tiny_bev(randsteps=3)
    v3 = m3.init({"params": jax.random.PRNGKey(0),
                  "diffusion": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, img, *rig, gt,
                 train=False)
    _, unc3 = m3.apply(v3, img, *rig,
                       method=m3.sample_with_uncertainty,
                       rngs={"diffusion": jax.random.PRNGKey(5)})
    assert float(unc3["variance"].mean()) > 1e-10
