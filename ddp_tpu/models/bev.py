"""DDPBEVCamera — camera-only BEV map segmentation with diffusion decoding.

Parity target: class DDP (bev/mmdet3d/models/fusion_models/ddp.py:65-343) in
its camera-only configuration (bev/configs/nuscenes/seg/ddp-camera-bev256d2-
lss-scale001-d5-lr5e-5.yaml): Swin-T (stages 1-3) on 6 cameras →
GeneralizedLSSFPN → LSSTransform (depth softmax ⊗ features → frustum
unprojection → bev_pool → stride-2 downsample) → GeneralizedResNet + LSSFPN
BEV decoder → 256-ch 128² BEV features. Diffusion: multi-label GT masks
embedded per class scaled by (k+1), class-mean-pooled, squashed; cosine
log-SNR corruption; 5-layer time-FiLM deformable head decoding on the 200²
output grid with per-class sigmoid focal loss; inference = 3-step DDIM with
randsteps=5, probability threshold 0.5 re-embedding, step-accumulated output.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import diffusion as diff
from ..core.diffusion import DiffusionConfig
from ..nn.bev import (GeneralizedLSSFPN, GeneralizedResNet, LSSFPN,
                      LSSTransform, bev_grid_transform)
from ..nn.common import ConvModule
from ..nn.heads import DeformableHeadWithTime
from ..nn.losses import sigmoid_focal_loss
from ..nn.swin import SwinTransformer, swin_variant
from ..nn.time_embed import TimeMLP
from ..ops.resize import resize

MAP_CLASSES = ("drivable_area", "ped_crossing", "walkway", "stop_line",
               "carpark_area", "divider")


class DDPBEVCamera(nn.Module):
    num_classes: int = 6
    embed_dims: int = 256
    bit_scale: float = 0.01
    threshold: float = 0.5
    diffusion: DiffusionConfig = DiffusionConfig(timesteps=3, randsteps=5)
    backbone_variant: str = "tiny"
    image_size: Tuple[int, int] = (256, 704)
    out_grid: int = 200  # head output grid (0.5 m cells over ±50 m)
    input_scope: Tuple = ((-51.2, 51.2, 0.8), (-51.2, 51.2, 0.8))
    output_scope: Tuple = ((-50.0, 50.0, 0.5), (-50.0, 50.0, 0.5))
    xbound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    ybound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    lss_out_channels: int = 80
    depth_topk: int = 0  # LSS depth-bin pruning (0 = off; sensor-rate lever)
    bev_blocks: Tuple[Tuple[int, int, int], ...] = ((2, 160, 2), (2, 320, 2),
                                                    (2, 640, 1))
    decoder_layers: int = 5
    decoder_heads: int = 8
    decoder_ffn_dim: int = 1024
    decoder_attn: str = "msda"  # 'msda' faithful | 'window' TPU-native
    drop_path_rate: float = 0.3

    def setup(self):
        kw = swin_variant(self.backbone_variant)
        kw["out_indices"] = (1, 2, 3)
        self.backbone = SwinTransformer(drop_path_rate=self.drop_path_rate, **kw)
        self.camera_neck = GeneralizedLSSFPN(self.embed_dims)
        fh = self.image_size[0] // 8
        fw = self.image_size[1] // 8
        self.vtransform = LSSTransform(out_channels=self.lss_out_channels,
                                       image_size=self.image_size,
                                       feature_size=(fh, fw),
                                       xbound=self.xbound, ybound=self.ybound,
                                       zbound=self.zbound, dbound=self.dbound,
                                       depth_topk=self.depth_topk)
        self.bev_backbone = GeneralizedResNet(blocks=self.bev_blocks)
        self.bev_neck = LSSFPN(out_channels=self.embed_dims)
        self.decode_head = DeformableHeadWithTime(
            self.num_classes, self.embed_dims, num_layers=self.decoder_layers,
            num_heads=self.decoder_heads, ffn_dim=self.decoder_ffn_dim,
            attn_type=self.decoder_attn,
        )
        self.embedding_table = nn.Embed(self.num_classes + 1, self.embed_dims)
        self.transform = ConvModule(self.embed_dims, (1, 1))
        self.time_mlp = TimeMLP(dim=self.embed_dims * 4)

    # --- encoders --------------------------------------------------------
    def extract_bev_feat(self, img, cam2lidar_rots, cam2lidar_trans, intrins,
                         post_rots, post_trans, train=False) -> jnp.ndarray:
        """6-camera sweep → fused BEV features [B, G, G, 256]."""
        b, n, h, w, _ = img.shape
        flat = img.reshape(b * n, h, w, 3)
        feats = self.backbone(flat, train=train)
        feats = self.camera_neck(feats, train=train)
        f0 = feats[0]
        f0 = f0.reshape(b, n, *f0.shape[1:])
        bev = self.vtransform(f0, cam2lidar_rots, cam2lidar_trans, intrins,
                              post_rots, post_trans, train=train)
        stages = self.bev_backbone(bev, train=train)
        return self.bev_neck(stages, train=train)

    # --- latent codec ----------------------------------------------------
    def encode_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """Multi-label masks [N, G, G, K] (at latent grid) → latent [N,G,G,C]:
        per-class index k+1 (0 when absent), embed, mean over classes, squash
        (fusion_models/ddp.py:206-211)."""
        factor = jnp.arange(1, self.num_classes + 1, dtype=jnp.int32)
        idx = masks.astype(jnp.int32) * factor  # [N, G, G, K]
        emb = self.embedding_table(idx)  # [N, G, G, K, C]
        emb = emb.mean(axis=-2)
        return (jax.nn.sigmoid(emb) * 2.0 - 1.0) * self.bit_scale

    def denoise_logits(self, x, mask_t, log_snr, train=False) -> jnp.ndarray:
        """Fuse + decode. Returns logits on the OUTPUT grid [N, 200, 200, K]."""
        feat = self.transform(jnp.concatenate([x, mask_t], axis=-1), train=train)
        t_emb = self.time_mlp(log_snr)
        feat = bev_grid_transform(feat, self.input_scope, self.output_scope)
        return self.decode_head(feat, t_emb, train=train)

    # --- training --------------------------------------------------------
    def __call__(self, img, cam2lidar_rots, cam2lidar_trans, intrins, post_rots,
                 post_trans, gt_masks, train: bool = True):
        """gt_masks: [B, outG, outG, K] binary multi-label BEV masks."""
        x = self.extract_bev_feat(img, cam2lidar_rots, cam2lidar_trans, intrins,
                                  post_rots, post_trans, train=train)
        b, g, _, _ = x.shape
        gt_small = resize(gt_masks.astype(jnp.float32), (g, g), mode="nearest")
        latent = self.encode_masks(gt_small)

        rng = self.make_rng("diffusion")
        noised, log_snr, _t = diff.corrupt(self.diffusion, rng, latent)
        logits = self.denoise_logits(x, noised, log_snr, train=train)

        losses = {}
        total = 0.0
        for k, name in enumerate(MAP_CLASSES[: self.num_classes]):
            lk = sigmoid_focal_loss(logits[..., k], gt_masks[..., k].astype(
                logits.dtype)).mean()
            losses[f"map.{name}.focal"] = lk
            total = total + lk
        losses["loss"] = total
        return total, losses

    # --- inference -------------------------------------------------------
    def _rollout_hypotheses(self, img, cam2lidar_rots, cam2lidar_trans,
                            intrins, post_rots, post_trans) -> jnp.ndarray:
        """3-step DDIM with step accumulation (fusion_models/ddp.py:268-303),
        keeping the randsteps hypotheses separate: returns per-hypothesis
        step-accumulated sigmoid scores [r, B, outG, outG, K]."""
        cfg = self.diffusion
        x = self.extract_bev_feat(img, cam2lidar_rots, cam2lidar_trans, intrins,
                                  post_rots, post_trans, train=False)
        b, g, _, c = x.shape
        r = cfg.randsteps
        xr = jnp.tile(x, (r, 1, 1, 1))

        # BEV time grid has no sample_range scaling (ddp.py:130-138)
        pairs = []
        T, td = cfg.timesteps, cfg.time_difference
        for step in range(T):
            pairs.append((1.0 - step / T, max(1.0 - (step + 1 + td) / T, 0.0)))

        rng = self.make_rng("diffusion")
        mask_t = jax.random.normal(rng, (r * b, g, g, c), x.dtype)
        outs = []
        for (t_now, t_next) in pairs:
            tb = jnp.full((r * b,), t_now, x.dtype)
            tn = jnp.full((r * b,), t_next, x.dtype)
            log_snr = cfg.log_snr_fn(tb)
            log_snr_next = cfg.log_snr_fn(tn)
            logits = self.denoise_logits(xr, mask_t, log_snr, train=False)
            probs = jax.nn.sigmoid(logits)
            pred = (probs > self.threshold).astype(jnp.float32)
            pred_small = resize(pred, (g, g), mode="nearest")
            x0 = self.encode_masks(pred_small)
            mask_t = diff.ddim_update(mask_t, x0, log_snr, log_snr_next)
            outs.append(probs)
        out = jnp.stack(outs, 0).reshape(T, r, b, self.out_grid, self.out_grid,
                                         self.num_classes)
        return out.mean(axis=0)  # accumulate steps, keep hypotheses

    def sample(self, img, cam2lidar_rots, cam2lidar_trans, intrins, post_rots,
               post_trans) -> jnp.ndarray:
        """3-step DDIM, randsteps ensembling, step accumulation. Returns
        sigmoid scores [B, outG, outG, K]."""
        return self._rollout_hypotheses(
            img, cam2lidar_rots, cam2lidar_trans, intrins, post_rots,
            post_trans).mean(axis=0)

    def sample_with_uncertainty(self, img, cam2lidar_rots, cam2lidar_trans,
                                intrins, post_rots, post_trans):
        """Inference + per-cell uncertainty from the randsteps ensemble
        (BASELINE config #3's uncertainty maps, BEV analog).

        Returns (scores [B, G, G, K], uncertainty dict):
          variance — mean over classes of the across-hypothesis variance of
                     the per-class sigmoid scores (0 when randsteps == 1)
          entropy  — mean over classes of the Bernoulli entropy (nats) of
                     the ensemble-mean score (total uncertainty)
        """
        hyp = self._rollout_hypotheses(img, cam2lidar_rots, cam2lidar_trans,
                                       intrins, post_rots, post_trans)
        scores = hyp.mean(axis=0)
        var = hyp.var(axis=0).mean(axis=-1)  # [B, G, G]
        p = jnp.clip(scores, 1e-12, 1.0 - 1e-12)
        ent = (-(p * jnp.log(p) + (1 - p) * jnp.log1p(-p))).mean(axis=-1)
        return scores, {"variance": var, "entropy": ent}
