"""ControlLDM — mask-conditioned Stable-Diffusion generation, TPU-native.

Parity targets:
  - ControlLDM: controlnet/cldm/cldm.py:308-435 (apply_model:328-341 runs the
    ControlNet then the UNet with scaled control residuals; unconditional
    conditioning:344; sd_locked optimizer split:416-424).
  - LatentDiffusion q_sample / p_losses: controlnet/ldm/models/diffusion/
    ddpm.py:356-360, 885-919 (eps-prediction MSE; SD 1.5 linear-sqrt betas
    linear_start=0.00085 linear_end=0.012, 1000 steps; scale_factor=0.18215).
  - DDIMSampler: controlnet/cldm/ddim_hacked.py:10-317 (make_schedule:23-53,
    p_sample_ddim:181-238 with classifier-free guidance).

TPU-first: the whole sampler is a single ``lax.scan`` over the timestep grid
— one XLA program per (steps, shape) pair; CFG runs cond/uncond as one
batched forward (batch 2N) so the UNet stays a large fused matmul workload;
bf16 activations with fp32 schedule math.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.autoencoder import AutoencoderKL
from ..nn.clip_text import CLIPTextEncoder
from ..nn.unet import ControlNet, UNetConfig, UNetModel


def make_beta_schedule(n_timestep: int = 1000, linear_start: float = 0.00085,
                       linear_end: float = 0.012) -> np.ndarray:
    """'linear' schedule of ddpm.py (sqrt-space linspace, squared)."""
    return np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                       dtype=np.float64) ** 2


def make_ddim_timesteps(num_ddim: int, num_ddpm: int = 1000) -> np.ndarray:
    """'uniform' discretization (ddim_hacked.py / util.make_ddim_timesteps):
    range(0, num_ddpm, num_ddpm//num_ddim) + 1, clipped in-range (the
    reference crashes when num_ddim doesn't divide num_ddpm)."""
    c = num_ddpm // num_ddim
    return np.minimum(np.arange(num_ddim) * c + 1, num_ddpm - 1)


class DDPMSchedule:
    """Precomputed fp64->fp32 diffusion constants (host-side, static)."""

    def __init__(self, n_timestep: int = 1000, linear_start: float = 0.00085,
                 linear_end: float = 0.012):
        betas = make_beta_schedule(n_timestep, linear_start, linear_end)
        alphas = 1.0 - betas
        self.num_timesteps = n_timestep
        self.alphas_cumprod = np.cumprod(alphas).astype(np.float32)
        self.sqrt_alphas_cumprod = np.sqrt(self.alphas_cumprod)
        self.sqrt_one_minus_alphas_cumprod = np.sqrt(1.0 - self.alphas_cumprod)

    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        """ddpm.py:356-360."""
        a = jnp.asarray(self.sqrt_alphas_cumprod)[t][:, None, None, None]
        s = jnp.asarray(self.sqrt_one_minus_alphas_cumprod)[t][:, None, None,
                                                               None]
        return a * x0 + s * noise

    def ddim_constants(self, steps: int, eta: float = 0.0):
        """alphas / alphas_prev / sigmas over the DDIM grid
        (ddim_hacked.py:30-53)."""
        ts = make_ddim_timesteps(steps, self.num_timesteps)
        a = self.alphas_cumprod[ts]
        a_prev = np.concatenate([[self.alphas_cumprod[0]], a[:-1]])
        sigmas = eta * np.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
        return ts.astype(np.int32), a.astype(np.float32), \
            a_prev.astype(np.float32), sigmas.astype(np.float32)


class ControlLDM(nn.Module):
    """Full generation stack: frozen VAE + frozen CLIP text + frozen SD UNet
    + trainable ControlNet.

    Methods mirror the reference surface: ``encode_first_stage`` /
    ``decode_first_stage`` / ``get_learned_conditioning`` / ``apply_model`` /
    ``p_losses`` / ``sample`` (DDIM+CFG).
    """

    unet: UNetConfig = None  # type: ignore[assignment]
    hint_channels: int = 3
    scale_factor: float = 0.18215
    clip_width: int = 768
    clip_layers: int = 12
    clip_vocab: int = 49408
    vae_ch: int = 128
    vae_ch_mult: tuple = (1, 2, 4, 4)
    vae_nrb: int = 2
    only_mid_control: bool = False

    @property
    def latent_downsample(self) -> int:
        """Spatial reduction of the first stage (SD's VAE is 8x; the
        from-scratch presets may use a shallower one — the hint encoder
        and sampling shapes follow it)."""
        return 2 ** (len(self.vae_ch_mult) - 1)

    def setup(self):
        cfg = self.unet or UNetConfig()
        self.diffusion_model = UNetModel(cfg)
        self.control_model = ControlNet(cfg, self.hint_channels,
                                        hint_downsample=self.latent_downsample)
        self.first_stage_model = AutoencoderKL(
            embed_dim=cfg.in_channels, ch=self.vae_ch,
            ch_mult=self.vae_ch_mult, num_res_blocks=self.vae_nrb)
        self.cond_stage_model = CLIPTextEncoder(
            width=self.clip_width, layers=self.clip_layers,
            heads=max(1, self.clip_width // 64), vocab_size=self.clip_vocab)
        self.schedule = DDPMSchedule()

    def encode_first_stage(self, img: jnp.ndarray,
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
        mean, logvar = self.first_stage_model.encode(img)
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.scale_factor * z

    def decode_first_stage(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.first_stage_model.decode(z / self.scale_factor)

    def get_learned_conditioning(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.cond_stage_model(ids)

    def apply_model(self, x_noisy, t, context, hint,
                    control_scales: float = 1.0):
        """cldm.py:328-341: controlnet residuals scaled then fed to UNet."""
        control = self.control_model(x_noisy, hint, t, context)
        control = [c * control_scales for c in control]
        return self.diffusion_model(x_noisy, t, context, control=control,
                                    only_mid_control=self.only_mid_control)

    def p_losses(self, rng: jax.Array, img: jnp.ndarray, hint: jnp.ndarray,
                 ids: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """eps-prediction MSE (ddpm.py:885-919, parameterization='eps')."""
        r_enc, r_t, r_noise = jax.random.split(rng, 3)
        z = self.encode_first_stage(img, r_enc)
        context = self.get_learned_conditioning(ids)
        b = z.shape[0]
        t = jax.random.randint(r_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(r_noise, z.shape, z.dtype)
        z_noisy = self.schedule.q_sample(z, t, noise)
        eps = self.apply_model(z_noisy, t, context, hint)
        loss = jnp.mean((eps - noise) ** 2)
        return {"loss": loss}

    def __call__(self, rng, img, hint, ids):
        out = self.p_losses(rng, img, hint, ids)
        if self.is_initializing():
            # touch the VAE decoder so a loss-only init creates ALL params
            # (sampling reuses the same variables)
            cfg = self.unet or UNetConfig()
            ds = self.latent_downsample
            z0 = jnp.zeros((img.shape[0], img.shape[1] // ds,
                            img.shape[2] // ds, cfg.in_channels), img.dtype)
            self.decode_first_stage(z0)
        return out

    def sample(self, rng: jax.Array, hint: jnp.ndarray, ids: jnp.ndarray,
               uncond_ids: jnp.ndarray, steps: int = 20,
               guidance_scale: float = 9.0, eta: float = 0.0,
               guess_mode: bool = False) -> jnp.ndarray:
        """DDIM sampling with CFG, as one lax.scan (ddim_hacked.py:123-238).

        Returns decoded images in [-1, 1]. hint: [B,H,W,3] in [0,1].
        """
        b = hint.shape[0]
        ds = self.latent_downsample
        h, w = hint.shape[1] // ds, hint.shape[2] // ds
        cfg = self.unet or UNetConfig()
        ts, a, a_prev, sigmas = self.schedule.ddim_constants(steps, eta)
        context = self.get_learned_conditioning(ids)
        ucontext = self.get_learned_conditioning(uncond_ids)
        # guess mode: exponentially decayed control scales (gradio demos)
        if guess_mode:
            scales = np.array([0.825 ** (12 - i) for i in range(13)],
                              np.float32)
        else:
            scales = np.ones((13,), np.float32)

        rng, r0 = jax.random.split(rng)
        x = jax.random.normal(r0, (b, h, w, cfg.in_channels), jnp.float32)

        ctx2 = jnp.concatenate([ucontext, context], axis=0)
        hint2 = jnp.concatenate([hint, hint], axis=0)

        def step(carry, sched):
            x, rng = carry
            t_i, a_i, a_prev_i, sigma_i = sched
            tb = jnp.full((2 * b,), t_i, jnp.int32)
            x2 = jnp.concatenate([x, x], axis=0)
            control = self.control_model(x2, hint2, tb, ctx2)
            control = [c * s for c, s in zip(control, list(scales))]
            eps2 = self.diffusion_model(x2, tb, ctx2, control=control,
                                        only_mid_control=self.only_mid_control)
            e_uncond, e_cond = jnp.split(eps2, 2, axis=0)
            e_t = e_uncond + guidance_scale * (e_cond - e_uncond)
            pred_x0 = (x - jnp.sqrt(1.0 - a_i) * e_t) / jnp.sqrt(a_i)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev_i - sigma_i ** 2,
                                          0.0)) * e_t
            rng, rn = jax.random.split(rng)
            noise = sigma_i * jax.random.normal(rn, x.shape, x.dtype)
            x = jnp.sqrt(a_prev_i) * pred_x0 + dir_xt + noise
            return (x, rng), None

        sched = (jnp.asarray(ts[::-1].copy()), jnp.asarray(a[::-1].copy()),
                 jnp.asarray(a_prev[::-1].copy()),
                 jnp.asarray(sigmas[::-1].copy()))
        (x, _), _ = jax.lax.scan(step, (x, rng), sched)
        return self.decode_first_stage(x)


def add_control_from_sd(sd_params: Dict, control_init: Dict) -> Dict:
    """Weight surgery: initialize ControlNet params from an SD UNet param
    tree (tool_add_control.py equivalent) — copy time-embed, encoder and
    middle blocks; keep zero convs / hint encoder at their zero init.

    Both args are flax param dicts: ``sd_params`` the UNetModel params,
    ``control_init`` a freshly-initialized ControlNet params dict. Returns a
    new ControlNet params dict.
    """
    import flax

    control = flax.core.unfreeze(control_init)
    sd = flax.core.unfreeze(sd_params)
    for key in ("encoder", "middle", "time_embed_0", "time_embed_2"):
        if key in sd and key in control:
            control[key] = jax.tree_util.tree_map(lambda x: x, sd[key])
    return control


class ControlNetTrainer(nn.Module):
    """Train-loop adapter for ControlLDM — the tutorial_train.py equivalent.

    Matches the framework's (batch..., train=) step contract and draws the
    diffusion rng from the module rng stream. The reference freezes the SD
    UNet/VAE/CLIP and trains only the ControlNet (`sd_locked`,
    tutorial_train.py:14-16 + cldm.py configure_optimizers:416-424); the
    same effect here is optimizer-side: set optim.custom_keys lr_mult 0 for
    'diffusion_model', 'first_stage_model', 'cond_stage_model' (see the
    'controlnet_sd15' preset). The synthetic fill50k demo trains the whole
    stack from scratch instead.
    """

    unet: UNetConfig = None  # type: ignore[assignment]
    hint_channels: int = 3
    clip_width: int = 768
    clip_layers: int = 12
    clip_vocab: int = 49408
    vae_ch: int = 128
    vae_ch_mult: tuple = (1, 2, 4, 4)
    vae_nrb: int = 2
    scale_factor: float = 0.18215

    def setup(self):
        self.ldm = ControlLDM(unet=self.unet, hint_channels=self.hint_channels,
                              clip_width=self.clip_width,
                              clip_layers=self.clip_layers,
                              clip_vocab=self.clip_vocab,
                              vae_ch=self.vae_ch,
                              vae_ch_mult=self.vae_ch_mult,
                              vae_nrb=self.vae_nrb,
                              scale_factor=self.scale_factor)

    def __call__(self, img, hint, ids, train: bool = True):
        rng = self.make_rng("diffusion")
        out = self.ldm(rng, img, hint, ids)
        return out["loss"], {"loss": out["loss"]}

    def sample(self, hint, ids, uncond_ids, steps: int = 20,
               guidance_scale: float = 9.0):
        rng = self.make_rng("diffusion")
        return self.ldm.sample(rng, hint, ids, uncond_ids, steps=steps,
                               guidance_scale=guidance_scale)
