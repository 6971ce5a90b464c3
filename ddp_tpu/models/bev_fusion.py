"""DDPBEVFusion — camera + lidar BEV map segmentation (the 70.6 mIoU config).

Parity target: bev/mmdet3d/models/fusion_models/{bevfusion.py,ddp.py} with
configs/nuscenes/seg/ddp-fusion-bev256d2-lss-scale001-d5-lr5e-5.yaml:
camera branch as in DDPBEVCamera (LSS → 80ch BEV) plus a lidar branch —
hard voxelization (host, C++ native) → mean voxel features → SparseEncoder
(gather-GEMM sparse convs over host-built rulebooks) → dense 256ch BEV —
fused by ConvFuser (3x3 conv + BN + ReLU), then the shared BEV decoder and
diffusion map head.

Batch handling: per-sample rulebooks have static capacities; the model shifts
gather indices by the per-sample voxel offset and runs ONE sparse conv over
the folded [B·cap] voxel axis (the reference folds batch into the sparse
tensor the same way), so BatchNorm statistics span the whole batch.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import diffusion as diff
from ..core.diffusion import DiffusionConfig
from ..nn.bev import (GeneralizedLSSFPN, GeneralizedResNet, LSSFPN,
                      LSSTransform, bev_grid_transform)
from ..nn.common import BatchNorm, ConvModule
from ..nn.heads import DeformableHeadWithTime
from ..nn.losses import sigmoid_focal_loss
from ..nn.swin import SwinTransformer, swin_variant
from ..nn.time_embed import TimeMLP
from ..ops.resize import resize
from .bev import MAP_CLASSES

RULEBOOK_KEYS = ("subm1", "spconv2", "subm2", "spconv3", "subm3", "spconv4",
                 "subm4", "down", "down_coords", "down_valid")


class DDPBEVFusion(nn.Module):
    num_classes: int = 6
    embed_dims: int = 256
    bit_scale: float = 0.01
    threshold: float = 0.5
    diffusion: DiffusionConfig = DiffusionConfig(timesteps=3, randsteps=5)
    backbone_variant: str = "tiny"
    image_size: Tuple[int, int] = (256, 704)
    out_grid: int = 200
    input_scope: Tuple = ((-51.2, 51.2, 0.8), (-51.2, 51.2, 0.8))
    output_scope: Tuple = ((-50.0, 50.0, 0.5), (-50.0, 50.0, 0.5))
    xbound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    ybound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    lss_out_channels: int = 80
    depth_topk: int = 0  # LSS depth-bin pruning (0 = off; sensor-rate lever)
    lidar_channels: int = 128  # SparseEncoder output channels (x2 z-planes)
    lidar_dense_hw: int = 128
    lidar_dense_z: int = 2
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
        fh, fw = self.image_size[0] // 8, self.image_size[1] // 8
        self.vtransform = LSSTransform(out_channels=self.lss_out_channels,
                                       image_size=self.image_size,
                                       feature_size=(fh, fw),
                                       xbound=self.xbound, ybound=self.ybound,
                                       zbound=self.zbound, dbound=self.dbound,
                                       depth_topk=self.depth_topk)
        # lidar sparse-conv stack (SparseEncoder layout, batch-folded)
        channels = ((16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
        defs = [("lidar_conv_input", 16, "subm1", 27)]
        for j, ch in enumerate(channels[0]):
            defs.append((f"lidar_enc0_{j}", ch, "subm1", 27))
        for si in range(1, 4):
            chans = channels[si]
            defs.append((f"lidar_enc{si}_0", chans[0], f"spconv{si + 1}", 27))
            for j, ch in enumerate(chans[1:], start=1):
                defs.append((f"lidar_enc{si}_{j}", ch, f"subm{si + 1}", 27))
        defs.append(("lidar_conv_out", self.lidar_channels, "down", 3))
        from ..nn.sparse_conv import SparseConvLayer

        for name, ch, _key, k in defs:
            setattr(self, name, SparseConvLayer(ch, num_offsets=k))
        self.lidar_layer_defs = tuple((name, key) for name, _c, key, _k in defs)
        self.fuser_conv = ConvModule(self.embed_dims, (3, 3), norm="BN")
        self.bev_backbone = GeneralizedResNet(blocks=self.bev_blocks)
        self.bev_neck = LSSFPN(out_channels=self.embed_dims)
        self.decode_head = DeformableHeadWithTime(
            self.num_classes, self.embed_dims, num_layers=self.decoder_layers,
            num_heads=self.decoder_heads, ffn_dim=self.decoder_ffn_dim,
            attn_type=self.decoder_attn)
        self.embedding_table = nn.Embed(self.num_classes + 1, self.embed_dims)
        self.transform = ConvModule(self.embed_dims, (1, 1))
        self.time_mlp = TimeMLP(dim=self.embed_dims * 4)

    # --- encoders --------------------------------------------------------
    def extract_camera(self, img, cam2lidar_rots, cam2lidar_trans, intrins,
                       post_rots, post_trans, train=False):
        b, n, h, w, _ = img.shape
        feats = self.backbone(img.reshape(b * n, h, w, 3), train=train)
        feats = self.camera_neck(feats, train=train)
        f0 = feats[0].reshape(b, n, *feats[0].shape[1:])
        return self.vtransform(f0, cam2lidar_rots, cam2lidar_trans, intrins,
                               post_rots, post_trans, train=train)

    # --- latent codec (same as camera-only model) ------------------------
    def encode_masks(self, masks):
        factor = jnp.arange(1, self.num_classes + 1, dtype=jnp.int32)
        idx = masks.astype(jnp.int32) * factor
        emb = self.embedding_table(idx).mean(axis=-2)
        return (jax.nn.sigmoid(emb) * 2.0 - 1.0) * self.bit_scale

    def denoise_logits(self, x, mask_t, log_snr, train=False):
        feat = self.transform(jnp.concatenate([x, mask_t], axis=-1), train=train)
        t_emb = self.time_mlp(log_snr)
        feat = bev_grid_transform(feat, self.input_scope, self.output_scope)
        return self.decode_head(feat, t_emb, train=train)

    def fuse(self, cam_bev, lidar_bev, train=False):
        x = jnp.concatenate([cam_bev, lidar_bev], axis=-1)
        x = self.fuser_conv(x, train=train)
        stages = self.bev_backbone(x, train=train)
        return self.bev_neck(stages, train=train)

    def extract_bev_feat(self, img, cam2lidar_rots, cam2lidar_trans, intrins,
                         post_rots, post_trans, voxel_feats, rulebooks,
                         train=False):
        cam = self.extract_camera(img, cam2lidar_rots, cam2lidar_trans, intrins,
                                  post_rots, post_trans, train=train)
        lidar = self.extract_lidar_dense(voxel_feats, rulebooks, train=train)
        return self.fuse(cam, lidar, train=train)

    def extract_lidar_dense(self, voxel_feats, rulebooks, train=False):
        b, cap0, cf = voxel_feats.shape
        flat_feats = voxel_feats.reshape(b * cap0, cf)
        caps = {k: rulebooks[k].shape[-1] for k in rulebooks
                if k not in ("down_coords", "down_valid")}
        in_cap_of = {"subm1": cap0, "spconv2": cap0,
                     "subm2": caps["spconv2"], "spconv3": caps["spconv2"],
                     "subm3": caps["spconv3"], "spconv4": caps["spconv3"],
                     "subm4": caps["spconv4"], "down": caps["spconv4"]}
        folded = {}
        for key, in_cap in in_cap_of.items():
            g = rulebooks[key]
            offs = (jnp.arange(b, dtype=g.dtype) * in_cap)[:, None, None]
            g = jnp.where(g >= 0, g + offs, -1)
            folded[key] = jnp.moveaxis(g, 0, 1).reshape(g.shape[1], -1)
        hw, z = self.lidar_dense_hw, self.lidar_dense_z
        coords = rulebooks["down_coords"].reshape(b * caps["down"], 3)
        valid = rulebooks["down_valid"].reshape(b * caps["down"])
        boffs = jnp.repeat(jnp.arange(b) * (hw * hw * z), caps["down"])
        folded["down_coords"] = coords
        folded["down_valid"] = valid

        # run the conv stack on folded voxels, then densify per batch
        x = self._sparse_stack(flat_feats, folded, train)
        flat_idx = (coords[:, 0] * hw + coords[:, 1]) * z + coords[:, 2] + boffs
        flat_idx = jnp.where(valid, flat_idx, b * hw * hw * z)
        dense = jnp.zeros((b * hw * hw * z + 1, x.shape[-1]), x.dtype)
        dense = dense.at[flat_idx].add(jnp.where(valid[:, None], x, 0.0))
        return dense[:-1].reshape(b, hw, hw, z * x.shape[-1])

    def _sparse_stack(self, flat_feats, folded, train):
        """The SparseEncoder conv stack without densification."""
        x = flat_feats
        for name, key in self.lidar_layer_defs:
            x = getattr(self, name)(x, folded[key], train)
        return x

    # --- training --------------------------------------------------------
    def __call__(self, img, cam2lidar_rots, cam2lidar_trans, intrins, post_rots,
                 post_trans, voxel_feats, rulebooks, gt_masks, train=True):
        x = self.extract_bev_feat(img, cam2lidar_rots, cam2lidar_trans, intrins,
                                  post_rots, post_trans, voxel_feats, rulebooks,
                                  train=train)
        b, g, _, _ = x.shape
        gt_small = resize(gt_masks.astype(jnp.float32), (g, g), mode="nearest")
        latent = self.encode_masks(gt_small)
        rng = self.make_rng("diffusion")
        noised, log_snr, _t = diff.corrupt(self.diffusion, rng, latent)
        logits = self.denoise_logits(x, noised, log_snr, train=train)
        losses = {}
        total = 0.0
        for k, name in enumerate(MAP_CLASSES[: self.num_classes]):
            lk = sigmoid_focal_loss(logits[..., k],
                                    gt_masks[..., k].astype(logits.dtype)).mean()
            losses[f"map.{name}.focal"] = lk
            total = total + lk
        losses["loss"] = total
        return total, losses

    # --- inference -------------------------------------------------------
    def _rollout_hypotheses(self, img, cam2lidar_rots, cam2lidar_trans,
                            intrins, post_rots, post_trans, voxel_feats,
                            rulebooks):
        """Per-hypothesis step-accumulated scores [r, B, outG, outG, K]."""
        cfg = self.diffusion
        x = self.extract_bev_feat(img, cam2lidar_rots, cam2lidar_trans, intrins,
                                  post_rots, post_trans, voxel_feats, rulebooks,
                                  train=False)
        b, g, _, c = x.shape
        r = cfg.randsteps
        xr = jnp.tile(x, (r, 1, 1, 1))
        T, td = cfg.timesteps, cfg.time_difference
        pairs = [(1.0 - s / T, max(1.0 - (s + 1 + td) / T, 0.0)) for s in range(T)]
        rng = self.make_rng("diffusion")
        mask_t = jax.random.normal(rng, (r * b, g, g, c), x.dtype)
        outs = []
        for t_now, t_next in pairs:
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
               post_trans, voxel_feats, rulebooks):
        return self._rollout_hypotheses(
            img, cam2lidar_rots, cam2lidar_trans, intrins, post_rots,
            post_trans, voxel_feats, rulebooks).mean(axis=0)

    def sample_with_uncertainty(self, img, cam2lidar_rots, cam2lidar_trans,
                                intrins, post_rots, post_trans, voxel_feats,
                                rulebooks):
        """Fusion-path uncertainty maps — same statistics as the camera-only
        BEV model's sample_with_uncertainty."""
        hyp = self._rollout_hypotheses(img, cam2lidar_rots, cam2lidar_trans,
                                       intrins, post_rots, post_trans,
                                       voxel_feats, rulebooks)
        scores = hyp.mean(axis=0)
        var = hyp.var(axis=0).mean(axis=-1)
        p = jnp.clip(scores, 1e-12, 1.0 - 1e-12)
        ent = (-(p * jnp.log(p) + (1 - p) * jnp.log1p(-p))).mean(axis=-1)
        return scores, {"variance": var, "entropy": ent}
