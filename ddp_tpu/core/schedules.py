"""Continuous-time log-SNR noise schedules for the DDP noise-to-map recipe.

Behavioral parity targets (reference, studied not copied):
  - segmentation/mmseg/models/segmentors/ddp.py:14-28 — ``log``,
    ``beta_linear_log_snr``, ``alpha_cosine_log_snr``, ``log_snr_to_alpha_sigma``.
  - depth/depth/models/depther/ddp.py:207-208 — cosine ``gamma(t)`` form.
  - segmentation/mmseg/models/segmentors/ddp.py:204-213 — sampling timestep grid
    with ``time_difference`` offset.

Everything here is pure jnp, closed-form, and shape-polymorphic so it can be
used inside jit/scan without retracing per step.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def safe_log(t: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """log with the input clamped from below (reference ddp.py:14-15)."""
    return jnp.log(jnp.clip(t, min=eps))


def beta_linear_log_snr(t: jnp.ndarray) -> jnp.ndarray:
    """Linear-beta schedule expressed as log SNR (reference ddp.py:18-19)."""
    return -jnp.log(jnp.expm1(1e-4 + 10.0 * (t ** 2)))


def alpha_cosine_log_snr(
    t: jnp.ndarray, ns: float = 0.0002, ds: float = 0.00025
) -> jnp.ndarray:
    """Cosine schedule expressed as log SNR (reference ddp.py:22-24)."""
    cos = jnp.cos((t + ns) / (1.0 + ds) * math.pi * 0.5)
    return -safe_log(cos ** -2 - 1.0, eps=1e-5)


_SCHEDULES = {
    "linear": beta_linear_log_snr,
    "cosine": alpha_cosine_log_snr,
}


def get_log_snr_fn(name: str):
    """Look up a log-SNR schedule by name ('linear' | 'cosine')."""
    try:
        return _SCHEDULES[name]
    except KeyError:
        raise ValueError(f"invalid noise schedule {name!r}; choose from {sorted(_SCHEDULES)}")


def log_snr_to_alpha_sigma(log_snr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """alpha = sqrt(sigmoid(log_snr)), sigma = sqrt(sigmoid(-log_snr)).

    Reference ddp.py:27-28. alpha^2 + sigma^2 == 1 exactly.
    """
    alpha = jnp.sqrt(jax_sigmoid(log_snr))
    sigma = jnp.sqrt(jax_sigmoid(-log_snr))
    return alpha, sigma


def jax_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    # jax.nn.sigmoid, inlined to keep this module dependency-light.
    return 1.0 / (1.0 + jnp.exp(-x))


def cosine_gamma(t: jnp.ndarray, ns: float = 0.0002, ds: float = 0.00025) -> jnp.ndarray:
    """gamma(t) = cos^2(((t+ns)/(1+ds)) * pi/2) — the depth variant's corruption
    coefficient (reference depth/.../ddp.py:207-208). Equivalent to
    sigmoid(alpha_cosine_log_snr(t)) up to the eps clamps."""
    return jnp.cos((t + ns) / (1.0 + ds) * math.pi * 0.5) ** 2


def right_pad_dims_to(x_ndim: int, t: jnp.ndarray) -> jnp.ndarray:
    """Append singleton dims to ``t`` until it has ``x_ndim`` dims
    (reference ddp.py:199-203, shape-only variant)."""
    padding = x_ndim - t.ndim
    if padding <= 0:
        return t
    return t.reshape(t.shape + (1,) * padding)


def sampling_time_pairs(
    timesteps: int,
    sample_range: Tuple[float, float] = (0.0, 0.999),
    time_difference: float = 1.0,
) -> np.ndarray:
    """The (t_now, t_next) grid for the reverse rollout.

    Reference ``_get_sampling_timesteps`` (ddp.py:204-213):
      t_now  = 1 - (step / T) * (1 - s0)
      t_next = max(1 - (step + 1 + td) / T * (1 - s0), s0)

    Returns a static numpy array of shape [T, 2] so the rollout scan carries it
    as a compile-time constant (no per-batch repeat needed; broadcast instead).
    """
    s0 = sample_range[0]
    pairs = []
    for step in range(timesteps):
        t_now = 1.0 - (step / timesteps) * (1.0 - s0)
        t_next = max(1.0 - (step + 1 + time_difference) / timesteps * (1.0 - s0), s0)
        pairs.append((t_now, t_next))
    return np.asarray(pairs, dtype=np.float32)
