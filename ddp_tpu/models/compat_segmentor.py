"""Compat (non-diffusion) segmentors: EncoderDecoder and CascadeEncoderDecoder.

Parity targets:
  - mmseg/models/segmentors/encoder_decoder.py:16 — backbone(+neck) → decode
    head; aux head weighted 0.4.
  - mmseg/models/segmentors/cascade_encoder_decoder.py — ``num_stages`` decode
    heads; stage 0 consumes the feature pyramid, each later stage consumes
    (features, previous stage's logits). The canonical instance is OCRNet:
    FCNHead (loss weight 0.4) → OCRHead (weight 1.0) on HRNet
    (configs/ocrnet/*).

The DDP diffusion models live in segmentor.py; these exist for the inherited
mmseg surface (ablations, aux-style training, weight-import checks).
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..nn.compat_heads import OCRHead
from ..nn.heads import FCNHead
from ..nn.losses import cross_entropy_seg, seg_accuracy
from ..ops.resize import resize


def _resize_concat(feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """mmseg input_transform='resize_concat': upsample all levels to the
    finest and concat channels."""
    target = feats[0].shape[1:3]
    ups = [feats[0]] + [resize(f, target, mode="bilinear") for f in feats[1:]]
    return jnp.concatenate(ups, axis=-1)


class CascadeEncoderDecoder(nn.Module):
    """Two-stage cascade (FCN → OCR), mmseg cascade_encoder_decoder.py.

    ``backbone`` is any callable flax module returning a tuple of feature
    maps (constructed by the caller so every zoo backbone works).
    """

    backbone: nn.Module
    num_classes: int
    channels: int = 256
    ocr_channels: int = 128
    stage0_weight: float = 0.4
    align_corners: bool = False

    def setup(self):
        self.stage0 = FCNHead(self.num_classes, self.channels, norm="BN")
        self.stage1 = OCRHead(self.num_classes, channels=self.channels,
                              ocr_channels=self.ocr_channels)

    def forward_logits(self, img: jnp.ndarray, train: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = self.backbone(img, train=train)
        fused = _resize_concat(feats)
        logits0 = self.stage0(fused, train=train)
        logits1 = self.stage1([fused], logits0, train=train)
        return logits0, logits1

    def __call__(self, img: jnp.ndarray, gt: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        logits0, logits1 = self.forward_logits(img, train=train)
        full = gt.shape[1:3]
        up0 = resize(logits0, full, mode="bilinear",
                     align_corners=self.align_corners)
        up1 = resize(logits1, full, mode="bilinear",
                     align_corners=self.align_corners)
        loss0 = self.stage0_weight * cross_entropy_seg(up0, gt)
        loss1 = cross_entropy_seg(up1, gt)
        loss = loss0 + loss1
        return loss, {
            "decode_0.loss_ce": loss0,
            "decode_1.loss_ce": loss1,
            "decode_1.acc_seg": seg_accuracy(up1, gt),
            "loss": loss,
        }

    def predict(self, img: jnp.ndarray) -> jnp.ndarray:
        """argmax segmentation of the FINAL stage (encoder_decoder semantics:
        only the last head drives inference)."""
        _, logits1 = self.forward_logits(img, train=False)
        up = resize(logits1, img.shape[1:3], mode="bilinear",
                    align_corners=self.align_corners)
        return jnp.argmax(up, axis=-1)

class EncoderDecoder(nn.Module):
    """Generic encoder-decoder (mmseg encoder_decoder.py:16): backbone →
    registry-built decode head (+ optional FCN aux head, weight 0.4).

    ``head`` is any name from ``ddp_tpu.nn.head_registry.HEADS`` (the
    reference's ``decode_head=dict(type=...)``); heads that return
    (logits, aux_logits) tuples (EncHead's SE branch) contribute their aux
    term via sigmoid BCE against class presence, matching enc_head.py losses.
    """

    backbone: nn.Module
    head_name: str
    num_classes: int
    head_kwargs: Dict = None
    aux_head: bool = True
    aux_weight: float = 0.4
    aux_in_index: int = -2
    align_corners: bool = False

    def setup(self):
        from ..nn.head_registry import build_head

        kw = dict(self.head_kwargs or {})
        kw.setdefault("num_classes", self.num_classes)
        self.decode_head = build_head(self.head_name, **kw)
        if self.aux_head:
            self.auxiliary_head = FCNHead(self.num_classes, norm="BN")

    def forward_logits(self, img: jnp.ndarray, train: bool = False):
        feats = self.backbone(img, train=train)
        out = self.decode_head(list(feats), train=train)
        se_logits = None
        if isinstance(out, tuple):
            out, se_logits = out
        aux = (self.auxiliary_head(feats[self.aux_in_index], train=train)
               if self.aux_head else None)
        return out, aux, se_logits

    def __call__(self, img: jnp.ndarray, gt: jnp.ndarray, train: bool = True):
        logits, aux, se_logits = self.forward_logits(img, train=train)
        full = gt.shape[1:3]
        up = resize(logits, full, mode="bilinear",
                    align_corners=self.align_corners)
        loss = cross_entropy_seg(up, gt)
        logs = {"decode.loss_ce": loss, "decode.acc_seg": seg_accuracy(up, gt)}
        if aux is not None:
            up_aux = resize(aux, full, mode="bilinear",
                            align_corners=self.align_corners)
            loss_aux = self.aux_weight * cross_entropy_seg(up_aux, gt)
            logs["aux.loss_ce"] = loss_aux
            loss = loss + loss_aux
        if se_logits is not None:
            from ..nn.compat_heads2 import enc_onehot_labels

            tgt = enc_onehot_labels(gt, self.num_classes)
            se = jnp.mean(jnp.maximum(se_logits, 0) - se_logits * tgt
                          + jnp.log1p(jnp.exp(-jnp.abs(se_logits))))
            logs["loss_se"] = 0.2 * se
            loss = loss + 0.2 * se
        logs["loss"] = loss
        return loss, logs

    def predict(self, img: jnp.ndarray) -> jnp.ndarray:
        logits, _, _ = self.forward_logits(img, train=False)
        up = resize(logits, img.shape[1:3], mode="bilinear",
                    align_corners=self.align_corners)
        return jnp.argmax(up, axis=-1)
