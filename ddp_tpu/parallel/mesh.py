"""Device mesh construction and sharding rules — the TPU-native replacement
for the reference's NCCL/torch.distributed stack (SURVEY.md §2.6).

The reference implements data parallelism only (MMDistributedDataParallel
gradient allreduce, mmseg/apis/train.py:104-113). Here the same capability is
one ``jax.sharding.Mesh`` + batch-sharded pjit: gradients come out globally
averaged because the loss mean runs over the global (sharded) batch — XLA
inserts the psum over ICI. We additionally expose a model axis for optional
tensor sharding of the decoder, which the reference does not have.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a [data, model] mesh over the available devices.

    Defaults to all devices on the data axis — the reference's pure-DP layout.
    The model axis is kept innermost so it rides the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-axis sharded.

    Single-process: a plain sharded device_put of the global batch.
    Multi-process (multi-host TPU): ``batch`` is each process's LOCAL shard
    (global_batch / process_count rows); the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the TPU-native equivalent of
    the reference's per-rank DistributedSampler feeding
    (mmseg/datasets/samplers/distributed_sampler.py:13).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch)


def shard_batch_chunk(mesh: Mesh, batches):
    """Place a stacked chunk of batches (leaves [T, B, ...]) onto the mesh:
    scan axis replicated, batch axis sharded over 'data'. Multi-process
    follows the same per-process local-rows contract as shard_batch."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batches)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batches)


def token_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [B, S, C] token tensor: batch over 'data', tokens over
    'model' — the decoder's spatial-sharding axis (SURVEY.md §5: deform-attn
    sampling is local after the value gather, so the token dim shards
    halo-free; GSPMD inserts the small one-level feature all_gather)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))


def local_batch_size(global_batch: int) -> int:
    """Rows this process must feed per step (global even-split contract)."""
    pc = jax.process_count()
    assert global_batch % pc == 0, (
        f"global batch {global_batch} not divisible by {pc} processes")
    return global_batch // pc
