"""Fused bilinear-upsample + cross-entropy Pallas kernel.

The reference computes the seg training loss at label resolution
(mmseg decode_head.py:263): logits [B,h,w,K] are bilinearly upsampled x4
and CE'd against [B,4h,4w] labels. Measured on v5e at the flagship shape
(b4, 512², K=150) this region costs ~47 ms/step HOWEVER it is expressed in
XLA — resize+CE, phase-decomposed lerps, bf16 phases all converge to the
same wall time because the math touches s²·h·w·K elements across ~a dozen
HBM round-trips (train_batch_curve.json: b4 4.79 vs b4_quarter 6.20
steps/s).

TPU-native design: ONE VMEM-resident pass. An integer-scale bilinear
upsample is, per output phase (p, q), a fixed 2x2-tap lerp of row/col
SHIFTED copies of the latent grid (losses._phase_taps). The row shifts are
precomputed on the XLA side (three [B,h,w,K] arrays — two extra cheap
copies) so kernel blocks need NO halo; the col shift happens inside the
kernel where the full row width is resident. Each grid block processes
[TB, w, K]: 16 static phase rounds of lerp → log-sum-exp → one-hot label
pick → masked accumulate, never writing an interpolated logit to HBM.
Traffic: read 3·latent + labels once (fwd), + write 3·latent grads (bwd)
≈ 160 MB/step at the flagship shape vs the ~26 GB of the XLA phase chain.

Backward (custom_vjp): the kernel emits gradients for the three shifted
copies (block-aligned, scatter-free); XLA applies the cheap transpose
shifts and sums. Accuracy comes out of the same forward pass
(correct := z_label == row max; float ties count as correct — measurement
only, not a training signal).

Fallback/oracle: losses.cross_entropy_seg_upsampled (pure XLA) off-TPU —
and the parity tests in tests/test_upsample_ce_kernel.py drive both.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

# latent rows per grid block. The kernels are SPLIT BY ROW PHASE (scale
# calls of scale col-phases each): one monolithic 16-phase unroll keeps
# several [TB, w, K] f32 temporaries live per phase and blew the 16 MB
# scoped-vmem stack at TB=8 (47.97M requested); int32 label tiles need
# TB % 8 == 0, so shrinking TB was not an option — splitting the unroll
# by row phase quarters the live set instead.
TB = 8


def _use_pallas() -> bool:
    env = os.environ.get("DDP_TPU_FUSED_CE")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    # DDP_TPU_FUSED_CE=interpret runs the kernel through the pallas
    # interpreter (CPU-testable without a chip)
    return os.environ.get("DDP_TPU_FUSED_CE") == "interpret"


def _taps(scale: int):
    """(use_minus_copy, w_lo, w_hi) per phase; torch align_corners=False."""
    taps = []
    for p in range(scale):
        phi = (p + 0.5) / scale - 0.5
        if phi < 0:
            taps.append((True, -phi, 1.0 + phi))  # taps (i-1, i)
        else:
            taps.append((False, 1.0 - phi, phi))  # taps (i, i+1)
    return taps


def _shift_rows(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Edge-clamped row shift on [B, h, w, K]: out[y] = x[clip(y+d)]."""
    if d == 0:
        return x
    if d < 0:
        return jnp.concatenate([x[:, :1]] * (-d) + [x[:, :d]], axis=1)
    return jnp.concatenate([x[:, d:]] + [x[:, -1:]] * d, axis=1)


def _shift_rows_T(g: jnp.ndarray, d: int) -> jnp.ndarray:
    """Transpose of _shift_rows for d = ±1 (scatter-add of the clamp).

    d=-1 (fwd out[y] = x[max(y-1,0)]): dx = [g0+g1, g2, …, g_{h-1}, 0]
    d=+1 (fwd out[y] = x[min(y+1,h-1)]): dx = [0, g0, …, g_{h-3}, g_{h-2}+g_{h-1}]
    """
    assert d in (-1, 1)
    if d < 0:
        head = (g[:, :1] + g[:, 1:2])
        return jnp.concatenate([head, g[:, 2:], jnp.zeros_like(g[:, :1])],
                               axis=1)
    tail = (g[:, -2:-1] + g[:, -1:])
    return jnp.concatenate([jnp.zeros_like(g[:, :1]), g[:, : g.shape[1] - 2],
                            tail], axis=1)


def _col_shift(z: jnp.ndarray, minus: bool) -> jnp.ndarray:
    """Edge-clamped col neighbor inside the kernel; z: [TB, w, K]."""
    if minus:  # neighbor j-1
        return jnp.concatenate([z[:, :1], z[:, :-1]], axis=1)
    return jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)


def _col_shift_T(g: jnp.ndarray, minus: bool) -> jnp.ndarray:
    """Transpose of _col_shift (in-kernel scatter-add of the clamp).

    minus (fwd out[j] = z[max(j-1,0)]): dz = [g0+g1, g2, …, g_{w-1}, 0]
    plus  (fwd out[j] = z[min(j+1,w-1)]): dz = [0, g0, …, g_{w-3}, g_{w-2}+g_{w-1}]
    """
    if minus:
        head = (g[:, :1] + g[:, 1:2])
        return jnp.concatenate([head, g[:, 2:], jnp.zeros_like(g[:, :1])],
                               axis=1)
    tail = (g[:, -2:-1] + g[:, -1:])
    return jnp.concatenate([jnp.zeros_like(g[:, :1]),
                            g[:, : g.shape[1] - 2], tail], axis=1)


def _fwd_kernel(lo_ref, hi_ref, *rest, p, scale, k, ignore_index):
    """ONE row phase p: rest = scale col-phase label refs [TB, w] +
    (nll, cnt, cor) outputs. zy = wy_lo·lo + wy_hi·hi where (lo, hi) are
    the two row-shifted copies this phase taps.

    The phase slices labels[:, p::s, q::s] are taken on the XLA side and
    passed as separate 2-D int32 inputs: Mosaic rejects the in-kernel 4-D
    reshape/slice of the raw label block ("unsupported shape cast")."""
    import jax.experimental.pallas as pl

    lab_refs = rest[: scale]
    nll_ref, cnt_ref, cor_ref = rest[scale:]

    @pl.when(pl.program_id(0) == 0)
    def _():
        nll_ref[:] = jnp.zeros_like(nll_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        cor_ref[:] = jnp.zeros_like(cor_ref)

    taps = _taps(scale)
    _, wy_lo, wy_hi = taps[p]
    tb, w, _ = lo_ref.shape
    zy = (lo_ref[:].astype(jnp.float32) * wy_lo
          + hi_ref[:].astype(jnp.float32) * wy_hi)
    nll_acc = jnp.float32(0)
    cnt_acc = jnp.float32(0)
    cor_acc = jnp.float32(0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (tb, w, k), 2)
    for q, (col_minus, wx_lo, wx_hi) in enumerate(taps):
        zn = _col_shift(zy, col_minus)
        z = (zn * wx_lo + zy * wx_hi) if col_minus else (
            zy * wx_lo + zn * wx_hi)
        lab = lab_refs[q][:]
        valid = lab != ignore_index
        safe = jnp.where(valid, lab, 0)
        onehot = (iota_k == safe[:, :, None]).astype(jnp.float32)
        m = jnp.max(z, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(z - m[:, :, None]), axis=-1))
        z_lab = jnp.sum(z * onehot, axis=-1)
        nll = lse - z_lab
        vf = valid.astype(jnp.float32)
        nll_acc += jnp.sum(nll * vf)
        cnt_acc += jnp.sum(vf)
        cor_acc += jnp.sum(vf * (z_lab >= m).astype(jnp.float32))
    # whole-(1,1)-block stores: element-indexed scalar stores to VMEM are
    # rejected by the TPU lowering ("Cannot store scalars to VMEM")
    nll_ref[:, :] = nll_ref[:, :] + nll_acc
    cnt_ref[:, :] = cnt_ref[:, :] + cnt_acc
    cor_ref[:, :] = cor_ref[:, :] + cor_acc


def _bwd_kernel(lo_ref, hi_ref, *rest, p, scale, k, ignore_index):
    """ONE row phase p: emits (dlo, dhi) for the two copies it taps."""
    lab_refs = rest[: scale]
    dlo_ref, dhi_ref = rest[scale:]
    taps = _taps(scale)
    _, wy_lo, wy_hi = taps[p]
    tb, w, _ = lo_ref.shape
    zy = (lo_ref[:].astype(jnp.float32) * wy_lo
          + hi_ref[:].astype(jnp.float32) * wy_hi)
    dzy = jnp.zeros((tb, w, k), jnp.float32)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (tb, w, k), 2)
    for q, (col_minus, wx_lo, wx_hi) in enumerate(taps):
        zn = _col_shift(zy, col_minus)
        z = (zn * wx_lo + zy * wx_hi) if col_minus else (
            zy * wx_lo + zn * wx_hi)
        lab = lab_refs[q][:]
        valid = lab != ignore_index
        safe = jnp.where(valid, lab, 0)
        onehot = (iota_k == safe[:, :, None]).astype(jnp.float32)
        m = jnp.max(z, axis=-1, keepdims=True)
        e = jnp.exp(z - m)
        soft = e / jnp.sum(e, axis=-1, keepdims=True)
        dz = (soft - onehot) * valid.astype(jnp.float32)[:, :, None]
        if col_minus:
            dzy += dz * wx_hi + _col_shift_T(dz * wx_lo, True)
        else:
            dzy += dz * wx_lo + _col_shift_T(dz * wx_hi, False)
    dlo_ref[:] = (dzy * wy_lo).astype(dlo_ref.dtype)
    dhi_ref[:] = (dzy * wy_hi).astype(dhi_ref.dtype)


def _pad_rows(x, hp):
    h = x.shape[1]
    if hp == h:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = (0, hp - h)
    return jnp.pad(x, pad)


def _prep(logits, labels, scale, ignore_index):
    """Row-shifted copies + padding, flattened to 3-D so kernel blocks are
    plain row strips (blocks never straddle a batch boundary: hp % TB == 0)."""
    b, h, w, k = logits.shape
    hp = -(-h // TB) * TB
    lm = _pad_rows(_shift_rows(logits, -1), hp).reshape(b * hp, w, k)
    l0 = _pad_rows(logits, hp).reshape(b * hp, w, k)
    lp = _pad_rows(_shift_rows(logits, +1), hp).reshape(b * hp, w, k)
    lab = _pad_rows(labels, hp * scale)
    if hp != h:
        mask_rows = jnp.arange(hp * scale) < h * scale
        lab = jnp.where(mask_rows[None, :, None], lab, ignore_index)
    labs = [lab[:, p::scale, q::scale].reshape(b * hp, w)
            for p in range(scale) for q in range(scale)]
    return lm, l0, lp, labs, b, hp


def _cparams():
    from jax.experimental.pallas import tpu as pltpu

    # the per-row-phase backward still stacks ~17.5 MB of unrolled
    # col-phase temporaries at TB=8/w=128/K=150 — just over Mosaic's 16 MB
    # default scoped-vmem limit; raise the cap (physical VMEM is larger)
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _specs(w, k, scale):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lspec = pl.BlockSpec((TB, w, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    labspec = pl.BlockSpec((TB, w), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    sumspec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return lspec, labspec, sumspec


def _row_phase_operands(lm, l0, lp, scale):
    """(lo, hi) copies tapped by each row phase p."""
    taps = _taps(scale)
    return [((lm, l0) if taps[p][0] else (l0, lp)) for p in range(scale)]


def _kernel_call(logits, labels, scale, ignore_index):
    import jax.experimental.pallas as pl

    b, h, w, k = logits.shape
    lm, l0, lp, labs, _, hp = _prep(logits, labels, scale, ignore_index)
    lspec, labspec, sumspec = _specs(w, k, scale)
    nll = cnt = cor = jnp.float32(0)
    for p, (lo, hi) in enumerate(_row_phase_operands(lm, l0, lp, scale)):
        kernel = functools.partial(_fwd_kernel, p=p, scale=scale, k=k,
                                   ignore_index=ignore_index)
        n_p, c_p, r_p = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 3,
            grid=(b * hp // TB,),
            in_specs=[lspec, lspec] + [labspec] * scale,
            out_specs=[sumspec, sumspec, sumspec],
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(lo, hi, *labs[p * scale: (p + 1) * scale])
        nll = nll + n_p[0, 0]
        cnt = cnt + c_p[0, 0]
        cor = cor + r_p[0, 0]
    return nll, cnt, cor


def _kernel_grad(logits, labels, scale, ignore_index):
    import jax.experimental.pallas as pl

    b, h, w, k = logits.shape
    lm, l0, lp, labs, _, hp = _prep(logits, labels, scale, ignore_index)
    lspec, labspec, _ = _specs(w, k, scale)
    taps = _taps(scale)
    dlm = dl0 = dlp = 0.0
    for p, (lo, hi) in enumerate(_row_phase_operands(lm, l0, lp, scale)):
        kernel = functools.partial(_bwd_kernel, p=p, scale=scale, k=k,
                                   ignore_index=ignore_index)
        dlo, dhi = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((b * hp, w, k), jnp.float32)] * 2,
            grid=(b * hp // TB,),
            in_specs=[lspec, lspec] + [labspec] * scale,
            out_specs=[lspec, lspec],
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(lo, hi, *labs[p * scale: (p + 1) * scale])
        if taps[p][0]:
            dlm = dlm + dlo
            dl0 = dl0 + dhi
        else:
            dl0 = dl0 + dlo
            dlp = dlp + dhi
    dlm = dlm.reshape(b, hp, w, k)[:, :h]
    dl0 = dl0.reshape(b, hp, w, k)[:, :h]
    dlp = dlp.reshape(b, hp, w, k)[:, :h]
    return dl0 + _shift_rows_T(dlm, -1) + _shift_rows_T(dlp, +1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ce_sums(logits, labels, scale, ignore_index):
    return _kernel_call(logits, labels, scale, ignore_index)


def _ce_sums_fwd(logits, labels, scale, ignore_index):
    out = _kernel_call(logits, labels, scale, ignore_index)
    return out, (logits, labels)


def _ce_sums_bwd(scale, ignore_index, res, cts):
    logits, labels = res
    g_nll = cts[0]  # cotangents of (nll_sum, count, correct); only nll flows
    dlogits = _kernel_grad(logits, labels, scale, ignore_index)
    return (g_nll * dlogits).astype(logits.dtype), None


_ce_sums.defvjp(_ce_sums_fwd, _ce_sums_bwd)


def fused_upsample_ce(logits: jnp.ndarray, labels: jnp.ndarray, scale: int,
                      ignore_index: int = 255,
                      with_acc: bool = False):
    """CE of the x`scale` bilinear upsample of `logits` against `labels`,
    fully fused on TPU (falls back to the XLA phase implementation off-TPU).

    Same semantics as resize(..., 'bilinear', align_corners=False) +
    cross_entropy_seg (denominator = labels.size, mmseg avg_non_ignore
    default). Returns loss, or (loss, full-res pixel accuracy).
    """
    if not _use_pallas():
        from ...nn.losses import cross_entropy_seg_upsampled

        return cross_entropy_seg_upsampled(logits, labels, scale,
                                           ignore_index=ignore_index,
                                           with_acc=with_acc)
    nll_sum, cnt, cor = _ce_sums(logits, labels, scale, ignore_index)
    loss = nll_sum / labels.size
    if with_acc:
        return loss, cor / jnp.maximum(cnt, 1.0)
    return loss
