"""Tests for the diffusion engine: q_sample, DDIM/DDPM updates, rollout.

DDIM/DDPM update math cross-checked against a torch re-derivation of the
closed-form reference equations (ddp.py:233-239, 266-280)."""
import jax
import jax.numpy as jnp
import numpy as np

from ddp_tpu.core import diffusion as D
from ddp_tpu.core import schedules as S


def test_q_sample_endpoints():
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full_like(x0, 2.0)
    # t=0: log_snr huge => alpha ~ 1, sigma ~ 0
    log_snr = S.alpha_cosine_log_snr(jnp.zeros((2,)))
    out = D.q_sample(x0, log_snr, noise)
    np.testing.assert_allclose(out, x0, atol=1e-2)
    # t~1: alpha ~ 0 => mostly noise
    log_snr = S.alpha_cosine_log_snr(jnp.full((2,), 0.999))
    out = D.q_sample(x0, log_snr, noise)
    np.testing.assert_allclose(out, noise, atol=0.1)


def test_ddim_update_closed_form():
    rng = np.random.RandomState(0)
    mask_t = jnp.asarray(rng.randn(2, 3, 3, 4), jnp.float32)
    x0 = jnp.asarray(rng.randn(2, 3, 3, 4), jnp.float32)
    t_now = jnp.asarray([0.9, 0.7])
    t_next = jnp.asarray([0.5, 0.2])
    ls, lsn = S.alpha_cosine_log_snr(t_now), S.alpha_cosine_log_snr(t_next)
    got = D.ddim_update(mask_t, x0, ls, lsn)

    # independent numpy re-derivation
    def np_as(l):
        sig = 1 / (1 + np.exp(-np.asarray(l, np.float64)))
        return np.sqrt(sig), np.sqrt(1 - sig)

    a, s = np_as(ls)
    an, sn = np_as(lsn)
    a, s, an, sn = [v[:, None, None, None] for v in (a, s, an, sn)]
    pred_noise = (np.asarray(mask_t) - a * np.asarray(x0)) / np.maximum(s, 1e-8)
    expect = np.asarray(x0) * an + pred_noise * sn
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_ddpm_update_noise_gating():
    mask_t = jnp.ones((2, 2, 2, 3))
    x0 = jnp.zeros_like(mask_t)
    ls = S.alpha_cosine_log_snr(jnp.asarray([0.5, 0.5]))
    lsn = S.alpha_cosine_log_snr(jnp.asarray([0.2, 0.2]))
    noise = jnp.ones_like(mask_t) * 100.0
    # t_next = 0 must gate the noise off entirely
    out0 = D.ddpm_update(mask_t, x0, ls, lsn, jnp.asarray([0.0, 0.0]), noise)
    out1 = D.ddpm_update(mask_t, x0, ls, lsn, jnp.asarray([0.3, 0.3]), noise)
    assert np.abs(np.asarray(out0)).max() < 10.0
    assert np.abs(np.asarray(out1)).max() > 10.0


def _toy_denoise(mask_t, log_snr):
    # "logits" = 2 channels; x0 pred = tanh compression of current latent
    logits = jnp.stack([mask_t.mean(-1), -mask_t.mean(-1)], axis=-1)
    return logits, jnp.tanh(mask_t) * 0.01


def test_rollout_scan_and_unroll_agree():
    cfg = D.DiffusionConfig(timesteps=3, randsteps=1, accumulation=True)
    rng = jax.random.PRNGKey(1)
    shape = (2, 4, 4, 8)
    a = D.rollout(cfg, rng, _toy_denoise, shape, unroll=False)
    b = D.rollout(cfg, rng, _toy_denoise, shape, unroll=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert a.shape == (2, 4, 4, 2)
    # accumulation returns probabilities
    np.testing.assert_allclose(np.asarray(a.sum(-1)), 1.0, atol=1e-5)


def test_rollout_ddpm_runs():
    cfg = D.DiffusionConfig(timesteps=3, method="ddpm", accumulation=False)
    out = D.rollout(cfg, jax.random.PRNGKey(0), _toy_denoise, (1, 4, 4, 8))
    assert out.shape == (1, 4, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_corrupt_shapes_and_range():
    cfg = D.DiffusionConfig()
    x0 = jnp.zeros((4, 8, 8, 16))
    xt, log_snr, t = D.corrupt(cfg, jax.random.PRNGKey(2), x0)
    assert xt.shape == x0.shape and log_snr.shape == (4,) and t.shape == (4,)
    assert (np.asarray(t) >= 0).all() and (np.asarray(t) <= 0.999).all()
