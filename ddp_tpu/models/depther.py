"""DDPDepther — monocular depth estimation via noise-to-map diffusion.

Parity target: class DDP (depth/depth/models/depther/ddp.py:34-247) with the
NYU/KITTI configs (depth/configs/ddp_nyu/ddp_swint_1k_w7_nyu_bs2x8_scale01.py):
backbone → FPN → merge; depth GT min-max-normalized into [−1,1]·bit_scale as a
ONE-channel map latent; gamma(t)=cos² corruption (sqrt-gamma form); fusion
1x1 conv over [x, depth_t] (256+1→256); time MLP fed the raw time t (NOT the
log-SNR — unlike the seg variant, ddp.py:137); 6-layer time-FiLM deformable
decoder with relu+eps depth output; SigLoss at full res; inference = 3 DDIM
steps with x0-clamping (ddim_step, ddp.py:227-234), randsteps-averaged, then
clamped to [min_depth, max_depth].
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.diffusion import DiffusionConfig
from ..core.schedules import cosine_gamma, right_pad_dims_to
from ..nn.common import ConvModule
from ..nn.convnext import ConvNeXt, convnext_variant
from ..nn.fpn import FPN, MultiStageMerging
from ..nn.heads import DeformableDepthHead
from ..nn.losses import sig_loss
from ..nn.swin import SwinTransformer, swin_variant
from ..nn.time_embed import TimeMLP
from ..ops.resize import resize


class DDPDepther(nn.Module):
    backbone_type: str = "swin"
    backbone_variant: str = "tiny"
    embed_dims: int = 256
    bit_scale: float = 0.1
    diffusion: DiffusionConfig = DiffusionConfig(timesteps=3)
    max_depth: float = 10.0
    min_depth: float = 1e-3
    drop_path_rate: float = 0.3
    decoder_layers: int = 6
    decoder_heads: int = 8
    decoder_ffn_dim: int = 1024
    align_corners: bool = False
    # 'deform' | 'upconv' (pixel-shuffle 4x output) | 'spade' — the reference's
    # head zoo (depth/.../deformable_head_with_time.py:21,172,285)
    head_variant: str = "deform"
    depth_act: str = "relu"  # 'relu' (parity) | 'softplus' (from-scratch)
    decoder_remat: bool = False  # jax.checkpoint decoder layers (train memory)

    def setup(self):
        if self.backbone_type == "swin":
            self.backbone = SwinTransformer(drop_path_rate=self.drop_path_rate,
                                            **swin_variant(self.backbone_variant))
        else:
            self.backbone = ConvNeXt(drop_path_rate=self.drop_path_rate,
                                     **convnext_variant(self.backbone_variant))
        self.neck_fpn = FPN(self.embed_dims, num_outs=4)
        self.neck_merge = MultiStageMerging(self.embed_dims)
        self.decode_head = DeformableDepthHead(
            self.embed_dims, num_layers=self.decoder_layers,
            num_heads=self.decoder_heads, ffn_dim=self.decoder_ffn_dim,
            min_depth=self.min_depth, variant=self.head_variant,
            act=self.depth_act, remat=self.decoder_remat,
        )
        self.down = ConvModule(self.embed_dims, (1, 1))  # 256+1 -> 256 fusion
        self.time_mlp = TimeMLP(dim=self.embed_dims * 4)

    def extract_feat(self, img, train=False):
        feats = self.backbone(img, train=train)
        feats = self.neck_fpn(feats, train=train)
        return self.neck_merge(feats, train=train)

    def normalize_depth(self, depth: jnp.ndarray) -> jnp.ndarray:
        """metric depth → [−1, 1]·bit_scale latent (ddp.py:133-136)."""
        norm = (depth - self.min_depth) / (self.max_depth - self.min_depth)
        return (norm * 2.0 - 1.0) * self.bit_scale

    def denoise_depth(self, x, depth_t, t, train=False):
        feat = self.down(jnp.concatenate([x, depth_t], axis=-1), train=train)
        t_emb = self.time_mlp(t)  # depth conditions on raw t (ddp.py:137)
        return self.decode_head(feat, t_emb, train=train)

    def __call__(self, img: jnp.ndarray, depth_gt: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training loss. depth_gt: [B, H, W] metric depth, <= 0 invalid."""
        x = self.extract_feat(img, train=train)
        b, h, w, _ = x.shape
        gt_small = resize(depth_gt[..., None], (h, w), mode="bilinear",
                          align_corners=self.align_corners)
        latent = self.normalize_depth(gt_small)  # [B, h, w, 1]

        rng = self.make_rng("diffusion")
        t_rng, n_rng = jax.random.split(rng)
        lo, hi = self.diffusion.sample_range
        t = jax.random.uniform(t_rng, (b,), minval=lo, maxval=hi)
        gamma = right_pad_dims_to(latent.ndim, cosine_gamma(t))
        eps = jax.random.normal(n_rng, latent.shape, latent.dtype)
        corrupted = jnp.sqrt(gamma) * latent + jnp.sqrt(1.0 - gamma) * eps

        pred = self.denoise_depth(x, corrupted, t, train=train)  # [B, h, w, 1]
        pred_up = resize(pred, depth_gt.shape[1:3], mode="bilinear",
                         align_corners=self.align_corners)[..., 0]
        loss = sig_loss(pred_up, depth_gt)
        logs = {"decode.loss_depth": loss, "loss": loss}
        return loss, logs

    def _time_pairs(self) -> np.ndarray:
        """Depth grid has no sample_range scaling (ddp.py:213-221):
        t_now = 1 − step/T ; t_next = max(1 − (step+1+td)/T, 0)."""
        T, td = self.diffusion.timesteps, self.diffusion.time_difference
        out = []
        for step in range(T):
            out.append((1.0 - step / T, max(1.0 - (step + 1 + td) / T, 0.0)))
        return np.asarray(out, np.float32)

    def _rollout_hypotheses(self, img: jnp.ndarray) -> jnp.ndarray:
        """Encode once, run the randsteps-folded 3-step DDIM rollout (gamma
        form, x0 clamped to ±bit_scale); return the per-hypothesis metric
        depth [r, B, ph, pw] BEFORE ensemble averaging — the across-
        hypothesis spread is the depther's native uncertainty signal
        (reference machinery ddp.py:219,241-245 is task-generic)."""
        cfg = self.diffusion
        x = self.extract_feat(img, train=False)
        b, h, w, _ = x.shape
        r = cfg.randsteps
        xr = jnp.tile(x, (r, 1, 1, 1))
        rng = self.make_rng("diffusion")
        depth_t = jax.random.normal(rng, (r * b, h, w, 1), x.dtype)

        pred = None
        for t_now, t_next in self._time_pairs():
            tb = jnp.full((r * b,), t_now, x.dtype)
            pred = self.denoise_depth(xr, depth_t, tb, train=False)
            # upconv head predicts at 4x the latent grid; bring the x0
            # estimate back to latent resolution for the DDIM update
            pred_lat = (pred if pred.shape[1:3] == (h, w)
                        else resize(pred, (h, w), mode="bilinear",
                                    align_corners=self.align_corners))
            x0 = jnp.clip(self.normalize_depth(pred_lat), -self.bit_scale, self.bit_scale)
            a_now = cosine_gamma(jnp.float32(t_now))
            a_next = cosine_gamma(jnp.float32(t_next))
            eps = (depth_t - jnp.sqrt(a_now) * x0) / jnp.sqrt(
                jnp.maximum(1.0 - a_now, 1e-8))
            depth_t = jnp.sqrt(a_next) * x0 + jnp.sqrt(1.0 - a_next) * eps

        ph, pw = pred.shape[1:3]
        return jnp.clip(pred.reshape(r, b, ph, pw),
                        self.min_depth, self.max_depth)

    def sample(self, img: jnp.ndarray) -> jnp.ndarray:
        """Inference: randsteps-averaged rollout clamped to
        [min_depth, max_depth]. Returns [B, H, W] metric depth."""
        pred = self._rollout_hypotheses(img).mean(axis=0)
        return resize(pred[..., None], img.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)[..., 0]

    def sample_with_uncertainty(self, img: jnp.ndarray):
        """Inference + per-pixel uncertainty from the randsteps ensemble
        (BASELINE config #3: "multi-step denoising with uncertainty maps" —
        the depth analog of the segmentor's sample_with_uncertainty).

        Returns (depth [B, H, W], uncertainty dict), all in metric units:
          std           — across-hypothesis standard deviation of metric
                          depth (0 when randsteps == 1)
          interval_low  — 10th percentile across hypotheses
          interval_high — 90th percentile across hypotheses
        """
        hyp = self._rollout_hypotheses(img)  # [r, B, ph, pw]
        depth = hyp.mean(axis=0)
        std = hyp.std(axis=0)
        lo = jnp.percentile(hyp, 10.0, axis=0)
        hi = jnp.percentile(hyp, 90.0, axis=0)
        full = img.shape[1:3]

        def up(a):
            return resize(a[..., None], full, mode="bilinear",
                          align_corners=self.align_corners)[..., 0]

        return up(depth), {"std": up(std), "interval_low": up(lo),
                           "interval_high": up(hi)}
