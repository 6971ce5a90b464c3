"""Decode-head registry — the mmseg ``HEADS`` registry surface
(segmentation/mmseg/models/builder.py: ``build_head(cfg)``) as a plain
name→class map over the compat zoo, so heads are selectable by config string
(mirroring the reference's ``type='UPerHead'`` dicts) without the reference's
metaclass machinery.

``build_head("uper", num_classes=19, channels=256)`` returns a constructed
flax module; every head takes a list of NHWC features and returns logits
(or a (logits, aux) tuple where the reference's does — EncHead).
"""
from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from .compat_heads import (ASPPHead, DAHead, DepthwiseSeparableASPPHead,
                           DPTHead, FPNHead, LRASPPHead, NLHead, OCRHead,
                           PointHead, PSPHead, SegformerHead, SETRMLAHead,
                           SETRUPHead, UPerHead)
from .compat_heads2 import (ANNHead, APCHead, CCHead, DMHead, DNLHead,
                            EMAHead, EncHead, GCHead, ISAHead, KNetHead,
                            PSAHead, SegmenterMaskHead, SepFCNHead, STDCHead)
from .heads import FCNHead, IdentityHead, NNHead

HEADS: Dict[str, Any] = {
    # part I (compat_heads.py)
    "psp": PSPHead,
    "uper": UPerHead,
    "aspp": ASPPHead,
    "sep_aspp": DepthwiseSeparableASPPHead,
    "segformer": SegformerHead,
    "ocr": OCRHead,
    "da": DAHead,
    "nl": NLHead,
    "lraspp": LRASPPHead,
    "fpn": FPNHead,
    "setr_up": SETRUPHead,
    "setr_mla": SETRMLAHead,
    "dpt": DPTHead,
    "point": PointHead,
    # part II (compat_heads2.py)
    "ann": ANNHead,
    "apc": APCHead,
    "cc": CCHead,
    "dm": DMHead,
    "dnl": DNLHead,
    "ema": EMAHead,
    "enc": EncHead,
    "gc": GCHead,
    "isa": ISAHead,
    "knet": KNetHead,
    "psa": PSAHead,
    "segmenter_mask": SegmenterMaskHead,
    "sep_fcn": SepFCNHead,
    "stdc": STDCHead,
    # fcn family (heads.py)
    "fcn": FCNHead,
    "nn": NNHead,
    "identity": IdentityHead,
}


class _LastLevel(nn.Module):
    """Adapter: the fcn-family heads consume one tensor; the registry's
    uniform interface is a feature list (in_index=-1 semantics)."""

    head: Any

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return self.head(feats[-1], train=train)


def build_head(name: str, **kwargs):
    """Construct a decode head by registry name (build_head equivalent).
    Every returned module takes a list of NHWC features."""
    try:
        cls = HEADS[name]
    except KeyError:
        raise ValueError(
            f"unknown head {name!r}; available: {sorted(HEADS)}") from None
    if cls in (NNHead, IdentityHead):
        kwargs.pop("num_classes", None)
        return _LastLevel(cls(**kwargs))
    if cls is STDCHead:  # fixed 1-channel boundary head
        kwargs.pop("num_classes", None)
        return cls(**kwargs)
    if cls is FCNHead:
        return _LastLevel(cls(**kwargs))
    return cls(**kwargs)
