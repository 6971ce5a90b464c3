"""The DDP diffusion engine: forward corruption (q_sample) and the multi-step
reverse rollout (DDIM / DDPM), written as a scan so the whole 3-step inference
compiles to ONE XLA program.

Behavioral parity targets (reference, studied not copied):
  - segmentation/mmseg/models/segmentors/ddp.py:131-290 — forward_train
    corruption, ``ddim_sample``, ``ddpm_sample``, accumulation/randsteps.
  - depth/depth/models/depther/ddp.py:112-247 — gamma-form corruption + sample.

Design: the engine is model-agnostic. The model supplies a ``denoise_fn`` that
maps (noisy map latent, log_snr vector) -> (task logits, re-encoded x0 latent);
the engine owns the schedule math, timestep grid, randsteps ensembling and
logit accumulation. Data layout is NHWC (TPU-native); batch and randsteps are
folded into a single leading axis for the denoiser call so the encoder features
can be broadcast once.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from .schedules import (
    get_log_snr_fn,
    log_snr_to_alpha_sigma,
    right_pad_dims_to,
    safe_log,
    sampling_time_pairs,
)

# denoise_fn(mask_t [N,...,C], log_snr [N]) -> (logits [N,...,K], x0_latent [N,...,C])
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static hyper-parameters of the DDP diffusion process.

    Mirrors the reference constructor arguments (ddp.py:56-66):
    bit_scale/timesteps/randsteps/time_difference/sample_range/noise_schedule/
    diffusion/accumulation.
    """

    timesteps: int = 3
    randsteps: int = 1
    time_difference: float = 1.0
    sample_range: Tuple[float, float] = (0.0, 0.999)
    schedule: str = "cosine"
    method: str = "ddim"  # 'ddim' | 'ddpm'
    accumulation: bool = True

    @property
    def log_snr_fn(self):
        return get_log_snr_fn(self.schedule)

    def time_pairs(self):
        return sampling_time_pairs(self.timesteps, self.sample_range, self.time_difference)


def sample_times(rng: jax.Array, batch: int, sample_range: Tuple[float, float]) -> jnp.ndarray:
    """t ~ U(sample_range) per sample (reference ddp.py:156-158)."""
    lo, hi = sample_range
    return jax.random.uniform(rng, (batch,), minval=lo, maxval=hi)


def q_sample(
    x0: jnp.ndarray,
    log_snr: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Corrupt a clean latent: alpha(log_snr) * x0 + sigma(log_snr) * noise
    (reference ddp.py:160-165). ``log_snr`` is [B]; broadcast over trailing dims."""
    padded = right_pad_dims_to(x0.ndim, log_snr)
    alpha, sigma = log_snr_to_alpha_sigma(padded)
    return alpha * x0 + sigma * noise


def corrupt(
    cfg: DiffusionConfig, rng: jax.Array, x0: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample per-example times, corrupt x0. Returns (x_t, log_snr, t).

    ``log_snr`` (not t) is what feeds the time MLP — the reference conditions
    the decoder on the noise level (ddp.py:171-172).
    """
    t_rng, n_rng = jax.random.split(rng)
    t = sample_times(t_rng, x0.shape[0], cfg.sample_range)
    log_snr = cfg.log_snr_fn(t)
    noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
    return q_sample(x0, log_snr, noise), log_snr, t


def ddim_update(
    mask_t: jnp.ndarray,
    x0_pred: jnp.ndarray,
    log_snr: jnp.ndarray,
    log_snr_next: jnp.ndarray,
) -> jnp.ndarray:
    """One DDIM reverse step (reference ddp.py:233-239):
    pred_noise = (mask_t - alpha * x0) / max(sigma, 1e-8)
    mask_next  = x0 * alpha_next + pred_noise * sigma_next
    """
    p = right_pad_dims_to(mask_t.ndim, log_snr)
    pn = right_pad_dims_to(mask_t.ndim, log_snr_next)
    alpha, sigma = log_snr_to_alpha_sigma(p)
    alpha_next, sigma_next = log_snr_to_alpha_sigma(pn)
    pred_noise = (mask_t - alpha * x0_pred) / jnp.clip(sigma, min=1e-8)
    return x0_pred * alpha_next + pred_noise * sigma_next


def ddpm_update(
    mask_t: jnp.ndarray,
    x0_pred: jnp.ndarray,
    log_snr: jnp.ndarray,
    log_snr_next: jnp.ndarray,
    t_next: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One DDPM posterior step (reference ddp.py:266-280):
    c = -expm1(log_snr - log_snr_next)
    mean = alpha_next * (mask_t * (1-c)/alpha + c * x0)
    var  = sigma_next^2 * c; noise gated by t_next > 0.
    """
    p = right_pad_dims_to(mask_t.ndim, log_snr)
    pn = right_pad_dims_to(mask_t.ndim, log_snr_next)
    alpha, sigma = log_snr_to_alpha_sigma(p)
    alpha_next, sigma_next = log_snr_to_alpha_sigma(pn)
    c = -jnp.expm1(p - pn)
    mean = alpha_next * (mask_t * (1.0 - c) / alpha + c * x0_pred)
    variance = (sigma_next ** 2) * c
    log_variance = safe_log(variance)
    gate = right_pad_dims_to(mask_t.ndim, (t_next > 0).astype(mask_t.dtype))
    return mean + jnp.exp(0.5 * log_variance) * gate * noise


def rollout(
    cfg: DiffusionConfig,
    rng: jax.Array,
    denoise_fn: DenoiseFn,
    latent_shape: Sequence[int],
    dtype=jnp.float32,
    unroll: bool = False,
) -> jnp.ndarray:
    """Run the full reverse process and return ensemble-averaged class logits.

    ``latent_shape`` is the per-call latent shape [N, ..., C] where N already
    includes randsteps * batch (the caller folds them — see
    models/segmentor.py). Matches reference ddim_sample/ddpm_sample
    (ddp.py:215-290): init mask_t ~ N(0,1); per step fuse+decode+argmax+re-embed
    via ``denoise_fn``; update; optionally accumulate softmax across steps; the
    caller averages across the randsteps axis.

    Returns: if accumulation, mean softmax over steps, shape [N, ..., K]
    (a probability map); else the final step's raw logits.
    """
    pairs = jnp.asarray(cfg.time_pairs())  # [T, 2] static values
    init_rng, noise_rng = jax.random.split(rng)
    mask_t = jax.random.normal(init_rng, tuple(latent_shape), dtype)
    step_rngs = jax.random.split(noise_rng, cfg.timesteps)

    def step(carry, xs):
        mask_t = carry
        (t_now, t_next), srng = xs
        n = mask_t.shape[0]
        t_now_b = jnp.full((n,), t_now, dtype)
        t_next_b = jnp.full((n,), t_next, dtype)
        log_snr = cfg.log_snr_fn(t_now_b)
        log_snr_next = cfg.log_snr_fn(t_next_b)
        logits, x0_pred = denoise_fn(mask_t, log_snr)
        if cfg.method == "ddim":
            mask_next = ddim_update(mask_t, x0_pred, log_snr, log_snr_next)
        elif cfg.method == "ddpm":
            noise = jax.random.normal(srng, mask_t.shape, mask_t.dtype)
            mask_next = ddpm_update(mask_t, x0_pred, log_snr, log_snr_next, t_next_b, noise)
        else:
            raise ValueError(f"unknown diffusion method {cfg.method!r}")
        out = jax.nn.softmax(logits, axis=-1) if cfg.accumulation else logits
        return mask_next, out

    if unroll:
        # Python-unrolled loop: required when denoise_fn closes over flax.linen
        # submodules (module calls cannot cross a lax.scan boundary unlifted).
        # Still compiles to one XLA program; T is small (3-10).
        outs = []
        carry = mask_t
        for i in range(cfg.timesteps):
            carry, out = step(carry, (pairs[i], step_rngs[i]))
            outs.append(out)
        outs = jnp.stack(outs, axis=0)
    else:
        _, outs = jax.lax.scan(step, mask_t, (pairs, step_rngs))
    if cfg.accumulation:
        return jnp.mean(outs, axis=0)  # mean prob over steps ([T,N,...,K] -> [N,...,K])
    return outs[-1]
