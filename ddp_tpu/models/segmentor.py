"""DDPSegmentor — the flagship noise-to-map semantic segmentation model.

Parity target: class DDP (segmentation/mmseg/models/segmentors/ddp.py:49-290)
with the ADE/Cityscapes configs: backbone (Swin/ConvNeXt) → FPN →
MultiStageMerging → single 1/4-scale 256-ch feature map; GT embedded via a
(K+1)-entry table, squashed to (sigmoid·2−1)·bit_scale; continuous-time cosine
log-SNR corruption; fusion 1x1 conv over [x, noised_map]; 1024-d time MLP on
the log-SNR; 6-layer time-FiLM deformable decoder; CE loss at full res + 0.4×
FCN aux loss; inference = `timesteps`-step DDIM/DDPM rollout with randsteps
ensembling and softmax accumulation.

TPU-first design notes: NHWC everywhere; rollout unrolled into one XLA program;
randsteps folded into the batch axis so the decoder runs as one big batched
matmul workload; all shapes static.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import diffusion as diff
from ..core.diffusion import DiffusionConfig
from ..core.schedules import log_snr_to_alpha_sigma
from ..ops.pallas.q_sample import fused_encode_map, fused_q_sample
from ..ops.pallas.upsample_ce import fused_upsample_ce
from ..nn.common import ConvModule
from ..nn.convnext import ConvNeXt, convnext_variant
from ..nn.fpn import FPN, MultiStageMerging
from ..nn.heads import DeformableHeadWithTime, FCNHead
from ..nn.losses import cross_entropy_seg, seg_accuracy
from ..nn.swin import SwinTransformer, swin_variant
from ..nn.time_embed import TimeMLP
from ..ops.resize import resize


class DDPSegmentor(nn.Module):
    num_classes: int = 150
    backbone_type: str = "swin"  # 'swin' | 'convnext'
    backbone_variant: str = "tiny"
    embed_dims: int = 256
    bit_scale: float = 0.01
    diffusion: DiffusionConfig = DiffusionConfig()
    aux_weight: float = 0.4
    align_corners: bool = False
    drop_path_rate: float = 0.3
    decoder_layers: int = 6
    decoder_heads: int = 8
    decoder_ffn_dim: int = 1024
    # 'msda' = faithful deformable attention; 'window' = TPU-native dense
    # shifted-window attention (no gather; see ops/pallas/msda_notes.md)
    decoder_attn: str = "msda"
    # window grid for decoder_attn='window'; 16 with decoder_heads=4 is the
    # measured-fast shape (work_dirs/decoder_microbench.json, r5)
    decoder_window: int = 8
    # FiLM layer variant: 'v1' post | 'v2' pre-norm dual | 'v3' per-norm dual
    # (ref transformer.py BaseTransformerLayer/V2/V3)
    decoder_film: str = "v1"
    # positional encoding: 'sine' | 'learned' (ref transformer.py:34-181)
    decoder_pos: str = "sine"
    # SelfAlignedDDP training mode (self_aligned_ddp.py:130-185): denoise the
    # model's OWN t=1 prediction instead of the GT latent
    self_aligned: bool = False
    # jax.checkpoint each decoder layer: required to train the msda path at
    # flagship shape on a 16G chip (gather temps pad 4x; 82G without remat)
    decoder_remat: bool = False
    # where the CE loss is computed:
    #   'full'    — reference parity (decode_head.py:263): bilinear-upsample
    #               logits to label resolution, CE there. At 512²x150 the
    #               upsampled logits are 157 MB/tensor — pure HBM traffic.
    #   'quarter' — TPU-native: CE at the decoder's 1/4-scale grid against
    #               nearest-downsampled labels (equivalent training signal,
    #               measured in train_profile_notes.md; eval still upsamples)
    loss_at: str = "full"

    def setup(self):
        if self.backbone_type == "swin":
            kw = swin_variant(self.backbone_variant)
            self.backbone = SwinTransformer(drop_path_rate=self.drop_path_rate, **kw)
        elif self.backbone_type == "convnext":
            kw = convnext_variant(self.backbone_variant)
            self.backbone = ConvNeXt(drop_path_rate=self.drop_path_rate, **kw)
        else:
            raise ValueError(f"unknown backbone {self.backbone_type!r}")
        self.neck_fpn = FPN(self.embed_dims, num_outs=4)
        self.neck_merge = MultiStageMerging(self.embed_dims)
        self.decode_head = DeformableHeadWithTime(
            self.num_classes, self.embed_dims, num_layers=self.decoder_layers,
            num_heads=self.decoder_heads, ffn_dim=self.decoder_ffn_dim,
            attn_type=self.decoder_attn, window=self.decoder_window,
            film=self.decoder_film,
            pos_type=self.decoder_pos, remat=self.decoder_remat,
        )
        self.aux_head = FCNHead(self.num_classes, self.embed_dims)
        # K+1 entries: index num_classes is the ignore/padding class (ddp.py:78)
        self.embedding_table = nn.Embed(self.num_classes + 1, self.embed_dims)
        # fusion conv: plain 1x1, bias, no norm/act (ddp.py:92-100)
        self.transform = ConvModule(self.embed_dims, (1, 1))
        self.time_mlp = TimeMLP(dim=self.embed_dims * 4)

    # --- building blocks -------------------------------------------------
    def extract_feat(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """backbone → FPN → merge: [B, H, W, 3] → [B, H/4, W/4, 256]."""
        feats = self.backbone(img, train=train)
        feats = self.neck_fpn(feats, train=train)
        return self.neck_merge(feats, train=train)

    def encode_map(self, labels: jnp.ndarray) -> jnp.ndarray:
        """Class-index map [..,] → squashed analog-bits latent [.., C].

        Runs the fused Pallas kernel on TPU (one-hot MXU lookup + squash in a
        single VMEM pass; ops/pallas/q_sample.py), XLA gather elsewhere."""
        table = self.embedding_table.embedding
        flat = fused_encode_map(labels.reshape(-1), table, self.bit_scale)
        return flat.reshape(labels.shape + (table.shape[-1],))

    def corrupt_fused(self, rng: jax.Array, labels: jnp.ndarray):
        """Sample t, fused embed+squash+corrupt of an int label map.

        Returns (x_t [B,h,w,C], log_snr [B]). Same math as
        diff.corrupt(encode_map(labels)) but embed→squash→corrupt runs as ONE
        Pallas kernel pass on TPU (ddp.py:149-165 fused)."""
        t_rng, n_rng = jax.random.split(rng)
        b, h, w = labels.shape
        t = diff.sample_times(t_rng, b, self.diffusion.sample_range)
        log_snr = self.diffusion.log_snr_fn(t)
        alpha, sigma = log_snr_to_alpha_sigma(log_snr)
        table = self.embedding_table.embedding
        noise = jax.random.normal(n_rng, (b * h * w, table.shape[-1]),
                                  table.dtype)
        rows = fused_q_sample(labels.reshape(-1), table, self.bit_scale,
                              jnp.repeat(alpha, h * w),
                              jnp.repeat(sigma, h * w), noise)
        return rows.reshape(b, h, w, table.shape[-1]), log_snr

    def denoise_logits(
        self, x: jnp.ndarray, mask_t: jnp.ndarray, log_snr: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """Fuse conditioning features with the noisy latent and decode."""
        feat = self.transform(jnp.concatenate([x, mask_t], axis=-1), train=train)
        t_emb = self.time_mlp(log_snr)
        return self.decode_head(feat, t_emb, train=train)

    # --- training --------------------------------------------------------
    def __call__(
        self, img: jnp.ndarray, gt: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Training loss. gt: [B, H, W] int labels with 255 = ignore.

        Follows forward_train (ddp.py:131-178): nearest-downsample GT to 1/4,
        255→K, embed+squash, corrupt at t~U(sample_range), fuse, decode,
        full-res CE + aux FCN CE.
        """
        x = self.extract_feat(img, train=train)
        b, h, w, _ = x.shape

        rng = self.make_rng("diffusion")
        if self.self_aligned:
            # Stage 1 (no grad): decode from pure noise at t=1, re-embed the
            # model's own prediction; stage 2 corrupts THAT with the same
            # noise draw (self_aligned_ddp.py:149-173).
            noise_rng, t_rng = jax.random.split(rng)
            noise = jax.random.normal(noise_rng, x.shape, x.dtype)
            log_snr1 = self.diffusion.log_snr_fn(jnp.ones((b,), x.dtype))
            logits1 = self.denoise_logits(x, noise, log_snr1, train=False)
            pred = jnp.argmax(jax.lax.stop_gradient(logits1), axis=-1)
            latent = self.encode_map(pred)
            t = diff.sample_times(t_rng, b, self.diffusion.sample_range)
            log_snr = self.diffusion.log_snr_fn(t)
            noised = diff.q_sample(latent, log_snr, noise)
        else:
            gt_down = resize(gt[..., None].astype(jnp.float32), (h, w), mode="nearest")
            gt_down = gt_down[..., 0].astype(jnp.int32)
            gt_down = jnp.where(gt_down == 255, self.num_classes, gt_down)
            noised, log_snr = self.corrupt_fused(rng, gt_down)
        logits = self.denoise_logits(x, noised, log_snr, train=train)

        # aux head is skipped entirely at weight 0 (the reference would
        # still run it; 0-weight exists here for ablation/benchmarks only)
        aux_logits = (self.aux_head(x, train=train)
                      if self.aux_weight else None)
        if self.loss_at == "quarter":
            # labels to the decoder grid (nearest keeps 255-ignore exact)
            gt_q = resize(gt[..., None].astype(jnp.float32), (h, w),
                          mode="nearest")[..., 0].astype(jnp.int32)
            loss_ce = cross_entropy_seg(logits, gt_q)
            acc = seg_accuracy(logits, gt_q)
            loss_aux = (self.aux_weight * cross_entropy_seg(aux_logits, gt_q)
                        if aux_logits is not None else jnp.zeros((), loss_ce.dtype))
        else:
            full = gt.shape[1:3]
            s = full[0] // h
            if (not self.align_corners and s > 1 and full == (h * s, w * s)):
                # fused upsample+CE: same math as resize+CE (parity-tested
                # incl. grads) without materializing the full-res logits —
                # the step's single biggest cost (~47 ms/step measured at
                # b4/512², train_batch_curve.json). On TPU this is ONE
                # VMEM-resident Pallas pass (ops/pallas/upsample_ce.py);
                # elsewhere the XLA phase decomposition.
                loss_ce, acc = fused_upsample_ce(logits, gt, s, with_acc=True)
                loss_aux = (
                    self.aux_weight * fused_upsample_ce(aux_logits, gt, s)
                    if aux_logits is not None
                    else jnp.zeros((), loss_ce.dtype))
            else:
                logits_up = resize(logits, full, mode="bilinear",
                                   align_corners=self.align_corners)
                loss_ce = cross_entropy_seg(logits_up, gt)
                acc = seg_accuracy(logits_up, gt)
                if aux_logits is not None:
                    aux_up = resize(aux_logits, full, mode="bilinear",
                                    align_corners=self.align_corners)
                    loss_aux = self.aux_weight * cross_entropy_seg(aux_up, gt)
                else:
                    loss_aux = jnp.zeros((), loss_ce.dtype)

        loss = loss_ce + loss_aux
        logs = {
            "decode.loss_ce": loss_ce,
            "decode.acc_seg": acc,
            "aux.loss_ce": loss_aux,
            "loss": loss,
        }
        return loss, logs

    # --- inference -------------------------------------------------------
    def _rollout_hypotheses(self, img: jnp.ndarray) -> jnp.ndarray:
        """Encode once, run the randsteps-folded rollout; return the per-
        hypothesis class probabilities [r, B, h/4, w/4, K] BEFORE ensemble
        averaging (the reference's multiple-hypothesis machinery,
        ddp.py:219,241-245)."""
        cfg = self.diffusion
        x = self.extract_feat(img, train=False)
        b, h, w, c = x.shape
        r = cfg.randsteps
        xr = jnp.tile(x, (r, 1, 1, 1))  # (r b) folding, r-major like the reference

        def denoise_fn(mask_t, log_snr):
            logits = self.denoise_logits(xr, mask_t, log_snr, train=False)
            pred = jnp.argmax(logits, axis=-1)
            return logits, self.encode_map(pred)

        rng = self.make_rng("diffusion")
        out = diff.rollout(cfg, rng, denoise_fn, (r * b, h, w, c), dtype=x.dtype,
                           unroll=True)
        return out.reshape(r, b, h, w, self.num_classes)

    def sample(self, img: jnp.ndarray) -> jnp.ndarray:
        """Whole-image inference: encode once, multi-step rollout, upsample.

        Returns class probabilities [B, H, W, K] (softmax-accumulated when
        cfg.accumulation, matching ddim_sample ddp.py:215-246).
        """
        out = self._rollout_hypotheses(img).mean(axis=0)
        return resize(out, img.shape[1:3], mode="bilinear",
                      align_corners=self.align_corners)

    def sample_with_uncertainty(self, img: jnp.ndarray):
        """Inference + per-pixel uncertainty maps from the randsteps ensemble
        (BASELINE config #3 "multi-step denoising with uncertainty maps").

        Returns (probs [B, H, W, K], uncertainty dict):
          variance — mean over classes of the across-hypothesis variance of
                     the class probabilities (disagreement between the r
                     independent rollouts; 0 when randsteps == 1)
          entropy  — predictive entropy (nats) of the ensemble-mean
                     distribution (total uncertainty, includes the model's
                     own softness)
        """
        hyp = self._rollout_hypotheses(img)  # [r, B, h, w, K]
        if not self.diffusion.accumulation:
            # non-accumulated rollouts return final-step logits; uncertainty
            # statistics need a probability simplex per hypothesis
            hyp = jax.nn.softmax(hyp, axis=-1)
        probs = hyp.mean(axis=0)
        var = hyp.var(axis=0).mean(axis=-1)  # [B, h, w]
        p = jnp.clip(probs / jnp.maximum(
            probs.sum(axis=-1, keepdims=True), 1e-12), 1e-12, 1.0)
        ent = -(p * jnp.log(p)).sum(axis=-1)  # [B, h, w]
        full = img.shape[1:3]
        probs_up = resize(probs, full, mode="bilinear",
                          align_corners=self.align_corners)
        var_up = resize(var[..., None], full, mode="bilinear",
                        align_corners=self.align_corners)[..., 0]
        ent_up = resize(ent[..., None], full, mode="bilinear",
                        align_corners=self.align_corners)[..., 0]
        return probs_up, {"variance": var_up, "entropy": ent_up}

    def predict(self, img: jnp.ndarray) -> jnp.ndarray:
        """argmax segmentation map [B, H, W]."""
        return jnp.argmax(self.sample(img), axis=-1)
