"""Fused q_sample Pallas kernel: embedding-gather → sigmoid-squash → corrupt.

The DDP hot path runs ``table[labels] → (sigmoid·2−1)·bit_scale →
alpha·x0 + sigma·noise`` on every train step (reference ddp.py:149-165) and
re-embeds the argmax prediction on every rollout step (ddp.py:230-232).
XLA lowers the embedding lookup to a dynamic-gather that cannot fuse with the
downstream elementwise ops, so the [N, C] embedding round-trips HBM between
the gather and the squash/corrupt.

TPU-native design: one VMEM pass per row-tile. The lookup is a one-hot
matmul on the MXU — with K ≲ a few hundred classes, a [TILE, Kp] @ [Kp, C]
matmul is far cheaper than issuing TILE independent gathers, and it fuses
with the squash + corrupt arithmetic inside the same kernel. The backward
pass needs only d(table) (labels are ints; alpha/sigma/noise have no
parameters upstream, but their cotangents are still returned exactly): it is
the transpose one-hot matmul, accumulated across the sequential TPU grid.

Exposes:
  fused_encode_map(labels, table, bit_scale)            -> squashed latent
  fused_q_sample(labels, table, bit_scale, alpha, sigma, noise) -> x_t
Both have XLA fallbacks (`*_xla`) used off-TPU and as correctness oracles.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 256  # rows per grid program


def _use_pallas() -> bool:
    env = os.environ.get("DDP_TPU_FUSED_QSAMPLE")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


def _pad_table(table: jnp.ndarray) -> jnp.ndarray:
    k, c = table.shape
    kp = -(-k // 128) * 128
    if kp != k:
        table = jnp.pad(table, ((0, kp - k), (0, 0)))
    return table


def _pad_rows(n: int) -> int:
    return -(-n // TILE) * TILE


# --- XLA fallbacks / oracles -------------------------------------------------

def encode_map_xla(labels: jnp.ndarray, table: jnp.ndarray,
                   bit_scale: float) -> jnp.ndarray:
    emb = jnp.take(table, labels, axis=0)
    return (jax.nn.sigmoid(emb) * 2.0 - 1.0) * bit_scale


def q_sample_xla(labels, table, bit_scale, alpha, sigma, noise):
    x0 = encode_map_xla(labels, table, bit_scale)
    return alpha[:, None] * x0 + sigma[:, None] * noise


# --- Pallas kernels ----------------------------------------------------------

def _onehot(lab: jnp.ndarray, kp: int, dtype) -> jnp.ndarray:
    ids = jax.lax.broadcasted_iota(jnp.int32, (lab.shape[0], kp), 1)
    return (ids == lab[:, None]).astype(dtype)


def _encode_kernel(lab_ref, table_ref, out_ref, *, bit_scale):
    lab = lab_ref[:, 0]
    oh = _onehot(lab, table_ref.shape[0], table_ref.dtype)
    emb = jnp.dot(oh, table_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = ((jax.nn.sigmoid(emb) * 2.0 - 1.0) * bit_scale).astype(
        out_ref.dtype)


def _qsample_kernel(lab_ref, table_ref, al_ref, si_ref, noise_ref, out_ref, *,
                    bit_scale):
    lab = lab_ref[:, 0]
    oh = _onehot(lab, table_ref.shape[0], table_ref.dtype)
    emb = jnp.dot(oh, table_ref[:], preferred_element_type=jnp.float32)
    x0 = (jax.nn.sigmoid(emb) * 2.0 - 1.0) * bit_scale
    out = al_ref[:] * x0 + si_ref[:] * noise_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _dtable_kernel(lab_ref, demb_ref, out_ref):
    """dtable += onehot(labels)^T @ demb, accumulated over the sequential grid."""
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lab = lab_ref[:, 0]
    oh = _onehot(lab, out_ref.shape[0], demb_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        oh, demb_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _call_rows(kernel, n, out_dtype, c, inputs, specs):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // TILE,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), out_dtype),
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec((TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(*inputs)


def _row_spec(width):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((TILE, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _table_spec(kp, c):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((kp, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _encode_pallas(labels: jnp.ndarray, table: jnp.ndarray,
                   bit_scale: float) -> jnp.ndarray:
    n = labels.shape[0]
    tp = _pad_table(table)
    kp, c = tp.shape
    np_ = _pad_rows(n)
    lab2 = jnp.pad(labels, (0, np_ - n)).reshape(np_, 1)
    out = _call_rows(
        functools.partial(_encode_kernel, bit_scale=bit_scale),
        np_, table.dtype, c,
        (lab2, tp),
        [_row_spec(1), _table_spec(kp, c)],
    )
    return out[:n]


def _qsample_pallas(labels, table, bit_scale, alpha, sigma, noise):
    n = labels.shape[0]
    tp = _pad_table(table)
    kp, c = tp.shape
    np_ = _pad_rows(n)
    pad = np_ - n
    lab2 = jnp.pad(labels, (0, pad)).reshape(np_, 1)
    al2 = jnp.pad(alpha.astype(jnp.float32), (0, pad)).reshape(np_, 1)
    si2 = jnp.pad(sigma.astype(jnp.float32), (0, pad)).reshape(np_, 1)
    nz2 = jnp.pad(noise, ((0, pad), (0, 0)))
    out = _call_rows(
        functools.partial(_qsample_kernel, bit_scale=bit_scale),
        np_, noise.dtype, c,
        (lab2, tp, al2, si2, nz2),
        [_row_spec(1), _table_spec(kp, c), _row_spec(1), _row_spec(1),
         _row_spec(c)],
    )
    return out[:n]


def _dtable_pallas(labels: jnp.ndarray, demb: jnp.ndarray,
                   k: int) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = demb.shape
    kp = -(-k // 128) * 128
    np_ = _pad_rows(n)
    pad = np_ - n
    # padded rows route to class kp-1 with zero demb → no contribution
    lab2 = jnp.pad(labels, (0, pad),
                   constant_values=kp - 1).reshape(np_, 1)
    demb2 = jnp.pad(demb, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _dtable_kernel,
        out_shape=jax.ShapeDtypeStruct((kp, c), jnp.float32),
        grid=(np_ // TILE,),
        in_specs=[_row_spec(1), _row_spec(c)],
        out_specs=pl.BlockSpec((kp, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(lab2, demb2.astype(jnp.float32))
    return out[:k]


# --- differentiable public API ------------------------------------------------
# NOTE: labels cross the custom_vjp boundary as float32, not int32. An int
# primal input would require a float0 cotangent, and float0 buffers wedge the
# sandboxed TPU relay backend (measured: a trivial float0 custom_vjp
# hangs the device). The f32 round-trip is exact for class indices < 2^24 and
# its zero cotangent is DCE'd by XLA.


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _encode_core(labels_f: jnp.ndarray, bit_scale: float,
                 table: jnp.ndarray) -> jnp.ndarray:
    labels = labels_f.astype(jnp.int32)
    if _use_pallas():
        return _encode_pallas(labels, table, bit_scale)
    return encode_map_xla(labels, table, bit_scale)


def _encode_fwd(labels_f, bit_scale, table):
    out = _encode_core(labels_f, bit_scale, table)
    return out, (labels_f, table.shape[0], out)


def _encode_bwd(bit_scale, res, g):
    labels_f, k, out = res
    labels = labels_f.astype(jnp.int32)
    # sig = (out/bit_scale + 1)/2 ; d out/d emb = 2*bit_scale*sig*(1-sig)
    sig = (out.astype(jnp.float32) / bit_scale + 1.0) * 0.5
    demb = g.astype(jnp.float32) * (2.0 * bit_scale) * sig * (1.0 - sig)
    if _use_pallas():
        dtable = _dtable_pallas(labels, demb, k)
    else:
        dtable = jax.ops.segment_sum(demb, labels, num_segments=k)
    return jnp.zeros_like(labels_f), dtable.astype(g.dtype)


_encode_core.defvjp(_encode_fwd, _encode_bwd)


def fused_encode_map(labels: jnp.ndarray, table: jnp.ndarray,
                     bit_scale: float) -> jnp.ndarray:
    """Squashed analog-bits latent: (sigmoid(table[labels])·2−1)·bit_scale.

    labels: [N] int; table: [K, C]. Returns [N, C] in table.dtype.
    """
    return _encode_core(labels.astype(jnp.float32), bit_scale, table)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _qsample_core(labels_f: jnp.ndarray, bit_scale: float, table: jnp.ndarray,
                  alpha: jnp.ndarray, sigma: jnp.ndarray,
                  noise: jnp.ndarray) -> jnp.ndarray:
    labels = labels_f.astype(jnp.int32)
    if _use_pallas():
        return _qsample_pallas(labels, table, bit_scale, alpha, sigma, noise)
    return q_sample_xla(labels, table, bit_scale, alpha, sigma, noise)


def _qs_fwd(labels_f, bit_scale, table, alpha, sigma, noise):
    x0 = fused_encode_map(labels_f.astype(jnp.int32), table, bit_scale)
    out = (alpha[:, None].astype(x0.dtype) * x0
           + sigma[:, None].astype(noise.dtype) * noise)
    return out, (labels_f, table.shape[0], x0, alpha, sigma, noise)


def _qs_bwd(bit_scale, res, g):
    labels_f, k, x0, alpha, sigma, noise = res
    labels = labels_f.astype(jnp.int32)
    gf = g.astype(jnp.float32)
    x0f = x0.astype(jnp.float32)
    sig = (x0f / bit_scale + 1.0) * 0.5
    demb = gf * alpha[:, None].astype(jnp.float32) * (2.0 * bit_scale) * sig * (1.0 - sig)
    if _use_pallas():
        dtable = _dtable_pallas(labels, demb, k)
    else:
        dtable = jax.ops.segment_sum(demb, labels, num_segments=k)
    dalpha = jnp.sum(gf * x0f, axis=-1).astype(alpha.dtype)
    dsigma = jnp.sum(gf * noise.astype(jnp.float32), axis=-1).astype(sigma.dtype)
    dnoise = (gf * sigma[:, None].astype(jnp.float32)).astype(noise.dtype)
    return (jnp.zeros_like(labels_f), dtable.astype(jnp.result_type(x0)),
            dalpha, dsigma, dnoise)


_qsample_core.defvjp(_qs_fwd, _qs_bwd)


def fused_q_sample(labels: jnp.ndarray, table: jnp.ndarray, bit_scale: float,
                   alpha: jnp.ndarray, sigma: jnp.ndarray,
                   noise: jnp.ndarray) -> jnp.ndarray:
    """x_t = alpha·encode(labels) + sigma·noise in ONE kernel pass.

    labels: [N] int; table: [K, C]; alpha, sigma: [N]; noise: [N, C].
    """
    return _qsample_core(labels.astype(jnp.float32), bit_scale, table,
                         alpha, sigma, noise)
