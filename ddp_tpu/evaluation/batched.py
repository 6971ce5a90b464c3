"""Microbatched inference — the serving-side fix for the working-set cliff.

Measured on v5e (ops/pallas/b8_cliff_notes.md): one XLA program whose
decoder working set exceeds ~65k tokens (e.g. 512² x batch 8) halves its
per-token throughput, while the same arithmetic split into <=4-image
dispatches runs at full rate (38.2 vs 18.5 img/s). This helper applies that
split to any per-batch inference callable.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def microbatched_call(fn: Callable, batch_leading: jnp.ndarray, *rest,
                      microbatch: int = 4):
    """Run ``fn(chunk, *rest_chunks)`` over <=``microbatch``-sized slices of
    the leading axis and concatenate the results.

    All of ``rest`` must share the leading axis length. The last chunk is
    padded up to ``microbatch`` so every dispatch reuses ONE compiled shape
    (the pad rows are dropped from the output).
    """
    n = batch_leading.shape[0]
    if n <= microbatch:
        return fn(batch_leading, *rest)
    n_chunks = math.ceil(n / microbatch)
    pad = n_chunks * microbatch - n

    def pad_to(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    args = [pad_to(batch_leading)] + [pad_to(r) for r in rest]
    outs = []
    for c in range(n_chunks):
        sl = slice(c * microbatch, (c + 1) * microbatch)
        outs.append(fn(*[a[sl] for a in args]))
    return jnp.concatenate(outs, axis=0)[:n]
