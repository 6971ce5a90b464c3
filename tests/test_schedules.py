"""Golden tests for the noise schedules against the closed-form reference
formulas (SURVEY.md §2.1; reference ddp.py:14-28), cross-checked with torch."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.core import schedules as S


def torch_reference_values(t):
    """Recompute the published closed forms with torch as an oracle."""
    import torch

    tt = torch.tensor(t, dtype=torch.float64)
    beta = -torch.log(torch.special.expm1(1e-4 + 10 * tt ** 2))
    ns, ds = 0.0002, 0.00025
    cos = torch.cos((tt + ns) / (1 + ds) * math.pi * 0.5)
    cosine = -torch.log((cos ** -2 - 1).clamp(min=1e-5))
    return beta.numpy(), cosine.numpy()


@pytest.mark.parametrize("t", [[0.0], [0.1, 0.5, 0.9, 0.999], [0.25]])
def test_log_snr_matches_reference_formulas(t):
    beta_ref, cos_ref = torch_reference_values(t)
    t = jnp.asarray(t, jnp.float32)
    np.testing.assert_allclose(S.beta_linear_log_snr(t), beta_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(S.alpha_cosine_log_snr(t), cos_ref, rtol=1e-4, atol=1e-5)


def test_alpha_sigma_unit_norm():
    t = jnp.linspace(0.0, 0.999, 17)
    for fn in (S.beta_linear_log_snr, S.alpha_cosine_log_snr):
        a, s = S.log_snr_to_alpha_sigma(fn(t))
        np.testing.assert_allclose(a ** 2 + s ** 2, np.ones_like(t), atol=1e-6)


def test_cosine_gamma_consistent_with_log_snr():
    # sigmoid(log_snr_cosine(t)) == gamma(t) (away from the eps clamp)
    t = jnp.linspace(0.05, 0.95, 7)
    gamma = S.cosine_gamma(t)
    sig = 1.0 / (1.0 + jnp.exp(-S.alpha_cosine_log_snr(t)))
    np.testing.assert_allclose(gamma, sig, atol=1e-4)


def test_sampling_time_pairs_grid():
    # T=3, td=1, range (0, 0.999): matches _get_sampling_timesteps (ddp.py:204-213)
    pairs = S.sampling_time_pairs(3, (0.0, 0.999), 1.0)
    expect = []
    T, td, s0 = 3, 1.0, 0.0
    for step in range(T):
        t_now = 1 - (step / T) * (1 - s0)
        t_next = max(1 - (step + 1 + td) / T * (1 - s0), s0)
        expect.append((t_now, t_next))
    np.testing.assert_allclose(pairs, np.asarray(expect, np.float32), atol=1e-7)
    assert pairs.shape == (3, 2)


def test_right_pad_dims():
    t = jnp.ones((4,))
    assert S.right_pad_dims_to(4, t).shape == (4, 1, 1, 1)
    assert S.right_pad_dims_to(1, t).shape == (4,)
