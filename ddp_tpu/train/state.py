"""Train state + jitted sharded train/eval step factories.

TPU-native equivalent of the reference's IterBasedRunner hot loop
(mmseg/apis/train.py:194 → train_step → OptimizerHook backward/clip/step,
SURVEY.md §3.1): here the whole iteration — forward, loss, grad, clip, AdamW
update, BN stat update, metric reduction — is ONE jitted XLA program over the
mesh, with donated state so params update in place in HBM.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array

    @classmethod
    def create(cls, params, tx, batch_stats=None, rng=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats if batch_stats is not None else {},
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )


def _to_bf16(tree):
    """Cast float32 leaves to bfloat16 (ints / other dtypes untouched)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x, tree)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh=None,
    donate: bool = True,
    batch_keys: Tuple[str, ...] = ("image", "label"),
    mixed_precision: bool = False,
    jit: bool = True,
    microbatch: int = 1,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict]]:
    """Build the jitted train step. ``model`` is a flax module whose __call__
    returns (loss, logs) given the batch values named by ``batch_keys``
    (positional, in order) plus train=True — ("image", "label") for seg/depth,
    the full camera-rig tuple for BEV.

    With a mesh: params/opt_state replicated, batch sharded along 'data'.
    The loss is a global batch mean, so grads are already the DP average —
    no explicit psum needed (XLA inserts collectives).

    ``mixed_precision=True`` is the TPU bf16 policy (the reference's
    Fp16OptimizerHook equivalent, bev/mmdet3d/apis/train.py:76-89, minus the
    loss scaling bf16 doesn't need): master params, optimizer state and the
    final loss stay f32; the forward/backward runs on bf16 casts of params and
    float inputs, and the cast boundary upcasts the gradients back to f32.

    ``microbatch=k`` (k > 1) accumulates gradients over k sequential
    sub-batch chunks inside the ONE jitted step (lax.scan) — the training-
    side analog of the inference program split in evaluation/batched.py:
    each chunk's live activation set is B/k of the monolithic step's, so
    per-chip batch can grow past the ~65k-decoder-token working-set cliff
    (ops/pallas/b8_cliff_notes.md). Numerics: equal chunks, so the mean of
    chunk-mean grads equals the full-batch mean grad; BN stats thread
    through the scan (chunk i sees stats updated by chunk i-1); each chunk
    folds its index into the diffusion/dropout rngs. With a mesh, requires
    (B / k) divisible by the data-axis size.
    """

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, new_rng = jax.random.split(state.rng)
        # fold in step so each iteration sees fresh noise even after restore
        rng = jax.random.fold_in(rng, state.step)
        d_rng, drop_rng = jax.random.split(rng)
        if mixed_precision:
            batch_c = {k: _to_bf16(v) for k, v in batch.items()}
        else:
            batch_c = batch

        def loss_fn(params, stats, chunk, rngs):
            variables = {"params": _to_bf16(params) if mixed_precision
                         else params}
            if stats:
                variables["batch_stats"] = stats
            (loss, logs), mutated = model.apply(
                variables,
                *[chunk[k] for k in batch_keys],
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return loss.astype(jnp.float32), (logs, mutated.get("batch_stats", {}))

        if microbatch > 1:
            b0 = batch_c[batch_keys[0]].shape[0]
            assert b0 % microbatch == 0, (b0, microbatch)
            stacked = {
                k: batch_c[k].reshape(
                    (microbatch, b0 // microbatch) + batch_c[k].shape[1:])
                for k in batch_keys}
            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)

            def scan_body(carry, inp):
                gsum, stats = carry
                i, chunk = inp
                rngs = {"diffusion": jax.random.fold_in(d_rng, i),
                        "dropout": jax.random.fold_in(drop_rng, i)}
                (loss_i, (logs_i, stats_i)), g_i = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, stats, chunk, rngs)
                gsum = jax.tree_util.tree_map(jnp.add, gsum, g_i)
                return (gsum, stats_i), (loss_i, logs_i)

            (gsum, new_stats), (loss_v, logs_v) = jax.lax.scan(
                scan_body, (zero_grads, state.batch_stats),
                (jnp.arange(microbatch), stacked))
            grads = jax.tree_util.tree_map(
                lambda g: g / microbatch, gsum)
            loss = loss_v.mean()
            logs = jax.tree_util.tree_map(lambda x: x.mean(axis=0), logs_v)
        else:
            (loss, (logs, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch_c,
                {"diffusion": d_rng, "dropout": drop_rng})
        if mixed_precision:
            # BN running stats and logged scalars stay f32 in the state
            f32 = lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
            new_stats = jax.tree_util.tree_map(f32, new_stats)
            logs = jax.tree_util.tree_map(f32, dict(logs))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs = dict(logs)
        logs["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_stats,
            rng=new_rng,
        )
        return new_state, logs

    if not jit:
        # raw step for callers that embed it in a larger jitted program
        # (e.g. bench.py's on-device multi-step fori_loop)
        return step_fn
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bsh),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_chunked_train_step(
    model,
    tx: optax.GradientTransformation,
    chunk: int,
    mesh=None,
    batch_keys: Tuple[str, ...] = ("image", "label"),
    mixed_precision: bool = False,
):
    """Multi-step train dispatch: ONE jitted program that lax.scans the raw
    train step over a stacked chunk of batches (leaves [chunk, B, ...]).

    Amortizes per-dispatch host latency over ``chunk`` steps — the same
    trick bench.py uses for honest timing, promoted to the real loop. Returns
    (new_state, logs) where each log leaf is stacked [chunk] so callers can
    report any in-chunk step. State is donated; batch chunks are sharded
    batch-axis (axis 1) over the mesh's data axis.
    """
    raw = make_train_step(model, tx, mesh=None, batch_keys=batch_keys,
                          mixed_precision=mixed_precision, jit=False)

    def chunk_fn(state: TrainState, batches) -> Tuple[TrainState, Dict]:
        return jax.lax.scan(raw, state, batches)

    if mesh is None:
        return jax.jit(chunk_fn, donate_argnums=(0,))
    rep = replicated(mesh)
    stacked = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(chunk_fn, in_shardings=(rep, stacked),
                   out_shardings=(rep, rep), donate_argnums=(0,))


def make_eval_step(model, mesh=None):
    """Jitted whole-image inference step returning per-image argmax maps."""

    def eval_fn(state: TrainState, batch, rng):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        probs = model.apply(variables, batch["image"], method=model.sample,
                            rngs={"diffusion": rng})
        return jnp.argmax(probs, axis=-1)

    if mesh is None:
        return jax.jit(eval_fn)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(rep, bsh, rep), out_shardings=bsh)
