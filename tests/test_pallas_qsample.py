"""Fused q_sample Pallas kernel vs XLA oracle (values + grads).

On the CPU test backend the public API dispatches to the XLA path, so the
Pallas kernels are exercised explicitly through pallas_call interpret mode
via DDP_TPU_FUSED_QSAMPLE plus jax's interpreter, keeping the oracle
comparison meaningful without TPU hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.ops.pallas import q_sample as Q


@pytest.fixture()
def data():
    rng = np.random.RandomState(0)
    n, k, c = 300, 7, 64  # n NOT a TILE multiple: exercises padding
    labels = jnp.asarray(rng.randint(0, k, n), jnp.int32)
    table = jnp.asarray(rng.randn(k, c), jnp.float32)
    alpha = jnp.asarray(rng.uniform(0.1, 1, n), jnp.float32)
    sigma = jnp.sqrt(1 - alpha ** 2)
    noise = jnp.asarray(rng.randn(n, c), jnp.float32)
    return labels, table, alpha, sigma, noise


def _interp(monkeypatch):
    """Force the pallas path with interpret-mode pallas_call."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw.setdefault("interpret", True)
        return orig(*a, **kw)

    return patched


def test_encode_map_matches_oracle(data, monkeypatch):
    labels, table, *_ = data
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", _interp(monkeypatch))
    monkeypatch.setenv("DDP_TPU_FUSED_QSAMPLE", "1")
    got = Q._encode_pallas(labels, table, 0.01)
    want = Q.encode_map_xla(labels, table, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_q_sample_matches_oracle(data, monkeypatch):
    labels, table, alpha, sigma, noise = data
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", _interp(monkeypatch))
    monkeypatch.setenv("DDP_TPU_FUSED_QSAMPLE", "1")
    got = Q._qsample_pallas(labels, table, 0.01, alpha, sigma, noise)
    want = Q.q_sample_xla(labels, table, 0.01, alpha, sigma, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dtable_pallas_matches_segment_sum(data, monkeypatch):
    labels, table, *_ = data
    import jax.experimental.pallas as pl

    monkeypatch.setattr(pl, "pallas_call", _interp(monkeypatch))
    rng = np.random.RandomState(1)
    demb = jnp.asarray(rng.randn(labels.shape[0], table.shape[1]), jnp.float32)
    got = Q._dtable_pallas(labels, demb, table.shape[0])
    want = jax.ops.segment_sum(demb, labels, num_segments=table.shape[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_autodiff_oracle(data):
    """Grad of the public API (XLA dispatch on CPU) vs plain autodiff of the
    oracle — validates the hand-written VJP formulas (table, alpha, sigma,
    noise cotangents)."""
    labels, table, alpha, sigma, noise = data

    def with_fused(table, alpha, sigma, noise):
        return jnp.sum(jnp.sin(
            Q.fused_q_sample(labels, table, 0.01, alpha, sigma, noise)))

    def with_oracle(table, alpha, sigma, noise):
        return jnp.sum(jnp.sin(
            Q.q_sample_xla(labels, table, 0.01, alpha, sigma, noise)))

    g1 = jax.grad(with_fused, argnums=(0, 1, 2, 3))(table, alpha, sigma, noise)
    g2 = jax.grad(with_oracle, argnums=(0, 1, 2, 3))(table, alpha, sigma, noise)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_encode_map_grad(data):
    labels, table, *_ = data

    def f1(table):
        return jnp.sum(Q.fused_encode_map(labels, table, 0.01) ** 2)

    def f2(table):
        return jnp.sum(Q.encode_map_xla(labels, table, 0.01) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f1)(table)),
                               np.asarray(jax.grad(f2)(table)),
                               rtol=1e-5, atol=1e-7)
