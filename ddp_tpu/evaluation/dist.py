"""Distributed evaluation collectives.

Parity target: the reference's rank-0 result collection
(`collect_results_gpu/cpu`, segmentation/mmseg/apis/test.py:140-233) and the
cross-rank metric all-reduce in `_parse_losses`
(mmseg/models/segmentors/base.py:171-225).

TPU-native: `multihost_utils.process_allgather` replaces the tmpdir-pickle /
NCCL-gather machinery — one call, works on any mesh, no filesystem."""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def allgather_metrics(local: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Gather per-host metric arrays (e.g. per-class intersect/union
    histograms) across processes and SUM them. On a single process this is
    the identity — the world_size==1 fallback the reference special-cases."""
    if jax.process_count() == 1:
        return {k: np.asarray(v) for k, v in local.items()}
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        {k: np.asarray(v) for k, v in local.items()})
    return {k: np.asarray(v).sum(axis=0) for k, v in gathered.items()}


def broadcast_from_host0(tree):
    """Rank-0 broadcast (reference seed broadcast, mmseg/apis/train.py:21-49)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
