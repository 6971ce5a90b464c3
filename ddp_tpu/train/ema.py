"""Exponential moving average of parameters.

Parity target: LitEma (controlnet/ldm/modules/ema.py) — decay warmup
min(decay, (1+updates)/(10+updates)), applied after each optimizer step.
Implemented as a pure pytree transform so it jits into the train step.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Tuple[Any, jnp.ndarray]:
    """Returns (ema_params, num_updates)."""
    return jax.tree_util.tree_map(lambda x: x, params), jnp.zeros((), jnp.int32)


def ema_update(ema_state: Tuple[Any, jnp.ndarray], params: Any,
               decay: float = 0.9999) -> Tuple[Any, jnp.ndarray]:
    ema_params, n = ema_state
    n = n + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    new_ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)
    return new_ema, n
