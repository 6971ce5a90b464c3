"""Torch→JAX checkpoint importer for the released DDP / mmseg weights.

Maps a torch ``state_dict`` (as a dict of numpy arrays — load it with
``torch.load(...)['state_dict']`` and convert) onto this framework's param
tree. Covers the mmseg DDP segmentor layout (backbone Swin/ConvNeXt, FPN +
MultiStageMerging neck, DeformableHeadWithTime, FCN aux head, embedding
table, transform conv, time MLP — segmentation/mmseg/models/* naming).

Layout conventions handled:
  - Conv2d weight [out,in,kh,kw] → flax kernel [kh,kw,in,out]
  - Linear weight [out,in] → flax kernel [in,out]
  - Swin qkv packed [3·C, C] with (3, heads, d) output layout — identical
    packing on both sides, plain transpose suffices
  - PatchMerging: torch unfold emits the 4C concat dim in (C, ky, kx) order
    (C slowest); this impl uses (ky, kx, C) — the norm/reduction input dims
    are permuted accordingly
  - mmcv ConvModule norm params live under ``.bn`` regardless of norm type
  - BatchNorm running stats → the ``batch_stats`` collection

Returns (variables, report) where report lists unmatched keys on both sides —
import is refused as "verified" only when both lists are empty.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):
    return np.transpose(w, (1, 0))


def _dw_conv(w):
    # torch depthwise [C,1,kh,kw] → flax feature-group kernel [kh,kw,1,C]
    return np.transpose(w, (2, 3, 1, 0))


def _merge_perm(w, c_in):
    """Permute a PatchMerging input dim from torch (C,4) order to (4,C)."""
    # w: [4C, ...] for reduction weight input dim (after transpose it's the
    # first axis of the flax kernel) or [4C] for norm params
    lead = w.shape[0]
    assert lead == 4 * c_in, (lead, c_in)
    idx = np.arange(lead).reshape(c_in, 4).T.reshape(-1)  # torch pos of mine
    return w[idx]


class Importer:
    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = dict(state)
        self.used: set = set()
        self.params: Dict[str, Any] = {}
        self.batch_stats: Dict[str, Any] = {}
        self.missing: List[str] = []

    def take(self, key: str):
        if key not in self.state:
            self.missing.append(key)
            return None
        self.used.add(key)
        return np.asarray(self.state[key])

    def has(self, key: str) -> bool:
        return key in self.state

    def put(self, tree: Dict, path: str, value):
        if value is None:
            return
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def set_p(self, path, value):
        self.put(self.params, path, value)

    def set_bs(self, path, value):
        self.put(self.batch_stats, path, value)

    # --- module importers ------------------------------------------------
    def conv_module(self, tkey: str, jpath: str, norm: bool = True):
        """mmcv ConvModule → ConvModule (conv + optional GN/BN)."""
        w = self.take(f"{tkey}.conv.weight")
        self.set_p(f"{jpath}/Conv_0/kernel", _conv(w) if w is not None else None)
        if self.has(f"{tkey}.conv.bias"):
            self.set_p(f"{jpath}/Conv_0/bias", self.take(f"{tkey}.conv.bias"))
        if norm and self.has(f"{tkey}.bn.weight"):
            if self.has(f"{tkey}.bn.running_mean"):  # BN/SyncBN
                self.set_p(f"{jpath}/BatchNorm_0/BatchNorm_0/scale",
                           self.take(f"{tkey}.bn.weight"))
                self.set_p(f"{jpath}/BatchNorm_0/BatchNorm_0/bias",
                           self.take(f"{tkey}.bn.bias"))
                self.set_bs(f"{jpath}/BatchNorm_0/BatchNorm_0/mean",
                            self.take(f"{tkey}.bn.running_mean"))
                self.set_bs(f"{jpath}/BatchNorm_0/BatchNorm_0/var",
                            self.take(f"{tkey}.bn.running_var"))
            else:  # GN
                self.set_p(f"{jpath}/GroupNorm32_0/GroupNorm_0/scale",
                           self.take(f"{tkey}.bn.weight"))
                self.set_p(f"{jpath}/GroupNorm32_0/GroupNorm_0/bias",
                           self.take(f"{tkey}.bn.bias"))

    def layer_norm(self, tkey: str, jpath: str):
        self.set_p(f"{jpath}/scale", self.take(f"{tkey}.weight"))
        self.set_p(f"{jpath}/bias", self.take(f"{tkey}.bias"))

    def linear(self, tkey: str, jpath: str, bias: bool = True):
        w = self.take(f"{tkey}.weight")
        self.set_p(f"{jpath}/kernel", _lin(w) if w is not None else None)
        if bias and self.has(f"{tkey}.bias"):
            self.set_p(f"{jpath}/bias", self.take(f"{tkey}.bias"))

    # --- swin backbone ---------------------------------------------------
    def swin(self, prefix: str, jprefix: str, depths, dims):
        t, j = prefix, jprefix
        w = self.take(f"{t}.patch_embed.projection.weight")
        self.set_p(f"{j}/patch_embed/kernel", _conv(w) if w is not None else None)
        self.set_p(f"{j}/patch_embed/bias", self.take(f"{t}.patch_embed.projection.bias"))
        self.layer_norm(f"{t}.patch_embed.norm", f"{j}/patch_norm")
        for si, depth in enumerate(depths):
            c = dims[si]
            for bi in range(depth):
                tb = f"{t}.stages.{si}.blocks.{bi}"
                jb = f"{j}/stage{si}_block{bi}"
                self.layer_norm(f"{tb}.norm1", f"{jb}/norm1")
                self.layer_norm(f"{tb}.norm2", f"{jb}/norm2")
                a = f"{tb}.attn.w_msa"
                self.set_p(f"{jb}/attn/relative_position_bias_table",
                           self.take(f"{a}.relative_position_bias_table"))
                self.used.add(f"{a}.relative_position_index")
                self.state.pop(f"{a}.relative_position_index", None)
                self.linear(f"{a}.qkv", f"{jb}/attn/qkv")
                self.linear(f"{a}.proj", f"{jb}/attn/proj")
                self.linear(f"{tb}.ffn.layers.0.0", f"{jb}/ffn/Dense_0")
                self.linear(f"{tb}.ffn.layers.1", f"{jb}/ffn/Dense_1")
            if si < len(depths) - 1:
                td = f"{t}.stages.{si}.downsample"
                jd = f"{j}/downsample{si}"
                nw = self.take(f"{td}.norm.weight")
                nb = self.take(f"{td}.norm.bias")
                rw = self.take(f"{td}.reduction.weight")
                if nw is not None:
                    self.set_p(f"{jd}/norm/scale", _merge_perm(nw, c))
                    self.set_p(f"{jd}/norm/bias", _merge_perm(nb, c))
                if rw is not None:
                    self.set_p(f"{jd}/reduction/kernel", _merge_perm(_lin(rw), c))
        for si in range(len(depths)):
            self.layer_norm(f"{t}.norm{si}", f"{j}/out_norm{si}")

    # --- convnext backbone ----------------------------------------------
    def convnext(self, prefix: str, jprefix: str, depths, dims):
        t, j = prefix, jprefix
        w = self.take(f"{t}.downsample_layers.0.0.weight")
        self.set_p(f"{j}/stem_conv/kernel", _conv(w) if w is not None else None)
        self.set_p(f"{j}/stem_conv/bias", self.take(f"{t}.downsample_layers.0.0.bias"))
        self.layer_norm(f"{t}.downsample_layers.0.1", f"{j}/stem_norm")
        for si in range(1, len(depths)):
            self.layer_norm(f"{t}.downsample_layers.{si}.0", f"{j}/down_norm{si}")
            w = self.take(f"{t}.downsample_layers.{si}.1.weight")
            self.set_p(f"{j}/down_conv{si}/kernel", _conv(w) if w is not None else None)
            self.set_p(f"{j}/down_conv{si}/bias",
                       self.take(f"{t}.downsample_layers.{si}.1.bias"))
        for si, depth in enumerate(depths):
            for bi in range(depth):
                tb = f"{t}.stages.{si}.{bi}"
                jb = f"{j}/stage{si}_block{bi}"
                w = self.take(f"{tb}.depthwise_conv.weight")
                self.set_p(f"{jb}/dwconv/kernel", _dw_conv(w) if w is not None else None)
                self.set_p(f"{jb}/dwconv/bias", self.take(f"{tb}.depthwise_conv.bias"))
                self.layer_norm(f"{tb}.norm", f"{jb}/norm")
                self.linear(f"{tb}.pointwise_conv1", f"{jb}/pwconv1")
                self.linear(f"{tb}.pointwise_conv2", f"{jb}/pwconv2")
                self.set_p(f"{jb}/gamma", self.take(f"{tb}.gamma"))
        for si in range(len(depths)):
            self.layer_norm(f"{t}.norm{si}", f"{j}/out_norm{si}")

    # --- necks + heads ---------------------------------------------------
    def fpn_and_merge(self):
        for i in range(4):
            self.conv_module(f"neck.0.lateral_convs.{i}", f"neck_fpn/lateral{i}")
            self.conv_module(f"neck.0.fpn_convs.{i}", f"neck_fpn/fpn{i}")
        self.conv_module("neck.1.down", "neck_merge/down")

    def decode_head(self, num_layers: int = 6, jpath: str = "decode_head"):
        w = self.take("decode_head.conv_seg.weight")
        self.set_p(f"{jpath}/conv_seg/kernel", _conv(w) if w is not None else None)
        self.set_p(f"{jpath}/conv_seg/bias", self.take("decode_head.conv_seg.bias"))
        for i in range(num_layers):
            tl = f"decode_head.encoder.layers.{i}"
            jl = f"{jpath}/encoder/layer{i}"
            a = f"{tl}.attentions.0"
            for tname, jname in (("sampling_offsets", "sampling_offsets"),
                                 ("attention_weights", "attention_weights"),
                                 ("value_proj", "value_proj"),
                                 ("output_proj", "output_proj")):
                self.linear(f"{a}.{tname}", f"{jl}/attn/{jname}")
            self.linear(f"{tl}.ffns.0.layers.0.0", f"{jl}/ffn/Dense_0")
            self.linear(f"{tl}.ffns.0.layers.1", f"{jl}/ffn/Dense_1")
            self.layer_norm(f"{tl}.norms.0", f"{jl}/norm1")
            self.layer_norm(f"{tl}.norms.1", f"{jl}/norm2")
            self.linear(f"{tl}.time_mlp.1", f"{jl}/time_mlp")

    def aux_head(self):
        self.conv_module("auxiliary_head.convs.0", "aux_head/conv0")
        w = self.take("auxiliary_head.conv_seg.weight")
        self.set_p("aux_head/conv_seg/kernel", _conv(w) if w is not None else None)
        self.set_p("aux_head/conv_seg/bias", self.take("auxiliary_head.conv_seg.bias"))

    def diffusion_bits(self):
        self.set_p("embedding_table/embedding", self.take("embedding_table.weight"))
        w = self.take("transform.conv.weight")
        self.set_p("transform/Conv_0/kernel", _conv(w) if w is not None else None)
        self.set_p("transform/Conv_0/bias", self.take("transform.conv.bias"))
        self.set_p("time_mlp/LearnedSinusoidalPosEmb_0/weights",
                   self.take("time_mlp.0.weights"))
        self.linear("time_mlp.1", "time_mlp/Dense_0")
        self.linear("time_mlp.3", "time_mlp/Dense_1")


def import_ddp_seg(state: Dict[str, np.ndarray], backbone: str, variant: str,
                   decoder_layers: int = 6
                   ) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Import a full DDP segmentor checkpoint. Returns (variables, report)."""
    from ..nn.convnext import convnext_variant
    from ..nn.swin import swin_variant

    imp = Importer(state)
    if backbone == "swin":
        kw = swin_variant(variant)
        dims = [kw["embed_dims"] * (2 ** i) for i in range(4)]
        imp.swin("backbone", "backbone", kw["depths"], dims)
    else:
        kw = convnext_variant(variant)
        imp.convnext("backbone", "backbone", kw["depths"], kw["dims"])
    imp.fpn_and_merge()
    imp.decode_head(num_layers=decoder_layers)
    imp.aux_head()
    imp.diffusion_bits()

    unused = sorted(k for k in imp.state if k not in imp.used
                    and not k.endswith("num_batches_tracked"))
    report = {"missing": imp.missing, "unused": unused}
    variables = {"params": imp.params}
    if imp.batch_stats:
        variables["batch_stats"] = imp.batch_stats
    return variables, report
