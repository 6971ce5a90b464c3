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


# ---------------------------------------------------------------------------
# Stable Diffusion 1.5 ControlLDM layout (VERDICT r1 item 10)
#
# Maps the torch checkpoint keys produced by controlnet/cldm/model.py
# create_model + tool_add_control.py (model.diffusion_model.*,
# control_model.*, first_stage_model.*, cond_stage_model.transformer.*) onto
# the flax ControlLDM tree (models/controlnet.py). No real SD checkpoint is
# available offline, so correctness is pinned by a structural round-trip
# test (tests/test_sd_import.py): every generated pair must exist in the
# model's init tree with the transposed shape, and every model leaf must be
# covered.

def _p_res(t, j, in_ch, out_ch):
    p = [(f"{t}.in_layers.0", f"{j}/in_norm", "norm"),
         (f"{t}.in_layers.2", f"{j}/in_conv", "conv"),
         (f"{t}.emb_layers.1", f"{j}/emb_proj", "lin"),
         (f"{t}.out_layers.0", f"{j}/out_norm", "norm"),
         (f"{t}.out_layers.3", f"{j}/out_conv", "conv")]
    if in_ch != out_ch:
        p.append((f"{t}.skip_connection", f"{j}/skip", "conv"))
    return p


def _p_st(t, j, depth=1):
    """SpatialTransformer (ldm attention.py; proj in/out are 1x1 convs in
    SD 1.5, Dense here)."""
    p = [(f"{t}.norm", f"{j}/norm", "norm"),
         (f"{t}.proj_in", f"{j}/proj_in", "conv_as_lin"),
         (f"{t}.proj_out", f"{j}/proj_out", "conv_as_lin")]
    for d in range(depth):
        tb, jb = f"{t}.transformer_blocks.{d}", f"{j}/block_{d}"
        for attn in ("attn1", "attn2"):
            p += [(f"{tb}.{attn}.to_q", f"{jb}/{attn}/to_q", "lin_nb"),
                  (f"{tb}.{attn}.to_k", f"{jb}/{attn}/to_k", "lin_nb"),
                  (f"{tb}.{attn}.to_v", f"{jb}/{attn}/to_v", "lin_nb"),
                  (f"{tb}.{attn}.to_out.0", f"{jb}/{attn}/to_out", "lin")]
        p += [(f"{tb}.ff.net.0.proj", f"{jb}/ff/proj_in", "lin"),
              (f"{tb}.ff.net.2", f"{jb}/ff/proj_out", "lin"),
              (f"{tb}.norm1", f"{jb}/norm1", "norm"),
              (f"{tb}.norm2", f"{jb}/norm2", "norm"),
              (f"{tb}.norm3", f"{jb}/norm3", "norm")]
    return p


def sd_unet_pairs(cfg, tprefix, jprefix, decoder_half=True):
    """(torch_key, jax_path, kind) pairs for the SD UNet encoder(+decoder).

    ``decoder_half=False`` emits only the shared encoder+middle (the
    ControlNet copy)."""
    pairs = [(f"{tprefix}.time_embed.0", f"{jprefix}/time_embed_0", "lin"),
             (f"{tprefix}.time_embed.2", f"{jprefix}/time_embed_2", "lin"),
             (f"{tprefix}.input_blocks.0.0", f"{jprefix}/encoder/conv_in",
              "conv")]
    in_ch, ds, k = cfg.model_channels, 1, 1
    for level, mult in enumerate(cfg.channel_mult):
        out_ch = cfg.model_channels * mult
        for i in range(cfg.num_res_blocks):
            pairs += _p_res(f"{tprefix}.input_blocks.{k}.0",
                            f"{jprefix}/encoder/res_{level}_{i}", in_ch, out_ch)
            if ds in cfg.attention_resolutions:
                pairs += _p_st(f"{tprefix}.input_blocks.{k}.1",
                               f"{jprefix}/encoder/attn_{level}_{i}",
                               cfg.transformer_depth)
            in_ch = out_ch
            k += 1
        if level != len(cfg.channel_mult) - 1:
            pairs.append((f"{tprefix}.input_blocks.{k}.0.op",
                          f"{jprefix}/encoder/down_{level}/conv", "conv"))
            k += 1
            ds *= 2
    pairs += _p_res(f"{tprefix}.middle_block.0", f"{jprefix}/middle/mid_res1",
                    in_ch, in_ch)
    pairs += _p_st(f"{tprefix}.middle_block.1", f"{jprefix}/middle/mid_attn",
                   cfg.transformer_depth)
    pairs += _p_res(f"{tprefix}.middle_block.2", f"{jprefix}/middle/mid_res2",
                    in_ch, in_ch)
    if not decoder_half:
        return pairs

    # skip-channel stack exactly as the forward builds it
    skips = [cfg.model_channels]
    for level, mult in enumerate(cfg.channel_mult):
        for i in range(cfg.num_res_blocks):
            skips.append(cfg.model_channels * mult)
        if level != len(cfg.channel_mult) - 1:
            skips.append(cfg.model_channels * mult)
    h_ch, k = in_ch, 0
    for level in reversed(range(len(cfg.channel_mult))):
        out_ch = cfg.model_channels * cfg.channel_mult[level]
        for i in range(cfg.num_res_blocks + 1):
            cat_ch = h_ch + skips.pop()
            pairs += _p_res(f"{tprefix}.output_blocks.{k}.0",
                            f"{jprefix}/up_res_{level}_{i}", cat_ch, out_ch)
            has_attn = ds in cfg.attention_resolutions
            if has_attn:
                pairs += _p_st(f"{tprefix}.output_blocks.{k}.1",
                               f"{jprefix}/up_attn_{level}_{i}",
                               cfg.transformer_depth)
            if level != 0 and i == cfg.num_res_blocks:
                up_idx = 2 if has_attn else 1
                pairs.append((f"{tprefix}.output_blocks.{k}.{up_idx}.conv",
                              f"{jprefix}/up_{level}/conv", "conv"))
            h_ch = out_ch
            k += 1
        if level != 0:
            ds //= 2
    pairs += [(f"{tprefix}.out.0", f"{jprefix}/out_norm", "norm"),
              (f"{tprefix}.out.2", f"{jprefix}/out_conv", "conv")]
    return pairs


def sd_controlnet_pairs(cfg, tprefix="control_model",
                        jprefix="control_model"):
    pairs = sd_unet_pairs(cfg, tprefix, jprefix, decoder_half=False)
    for i in range(7):  # input_hint_block convs at even indices
        pairs.append((f"{tprefix}.input_hint_block.{2 * i}",
                      f"{jprefix}/hint/conv_{i}", "conv"))
    pairs.append((f"{tprefix}.input_hint_block.14",
                  f"{jprefix}/hint/zero_conv", "conv"))
    n_skips = 1 + len(cfg.channel_mult) * cfg.num_res_blocks \
        + (len(cfg.channel_mult) - 1)
    for k in range(n_skips):
        pairs.append((f"{tprefix}.zero_convs.{k}.0",
                      f"{jprefix}/zero_conv_{k}", "conv"))
    pairs.append((f"{tprefix}.middle_block_out.0",
                  f"{jprefix}/middle_out", "conv"))
    return pairs


def _p_vae_res(t, j, in_ch, out_ch):
    p = [(f"{t}.norm1", f"{j}/norm1", "norm"),
         (f"{t}.conv1", f"{j}/conv1", "conv"),
         (f"{t}.norm2", f"{j}/norm2", "norm"),
         (f"{t}.conv2", f"{j}/conv2", "conv")]
    if in_ch != out_ch:
        p.append((f"{t}.nin_shortcut", f"{j}/nin_shortcut", "conv"))
    return p


def _p_vae_attn(t, j):
    return [(f"{t}.norm", f"{j}/norm", "norm"),
            (f"{t}.q", f"{j}/q", "conv_as_lin"),
            (f"{t}.k", f"{j}/k", "conv_as_lin"),
            (f"{t}.v", f"{j}/v", "conv_as_lin"),
            (f"{t}.proj_out", f"{j}/proj_out", "conv_as_lin")]


def sd_vae_pairs(ch=128, ch_mult=(1, 2, 4, 4), nrb=2,
                 tprefix="first_stage_model", jprefix="first_stage_model"):
    pairs = [(f"{tprefix}.encoder.conv_in", f"{jprefix}/encoder/conv_in",
              "conv")]
    in_ch = ch
    for level, mult in enumerate(ch_mult):
        out_ch = ch * mult
        for i in range(nrb):
            pairs += _p_vae_res(f"{tprefix}.encoder.down.{level}.block.{i}",
                                f"{jprefix}/encoder/down_{level}_block_{i}",
                                in_ch, out_ch)
            in_ch = out_ch
        if level != len(ch_mult) - 1:
            pairs.append((f"{tprefix}.encoder.down.{level}.downsample.conv",
                          f"{jprefix}/encoder/down_{level}_downsample",
                          "conv"))
    pairs += _p_vae_res(f"{tprefix}.encoder.mid.block_1",
                        f"{jprefix}/encoder/mid_block_1", in_ch, in_ch)
    pairs += _p_vae_attn(f"{tprefix}.encoder.mid.attn_1",
                         f"{jprefix}/encoder/mid_attn")
    pairs += _p_vae_res(f"{tprefix}.encoder.mid.block_2",
                        f"{jprefix}/encoder/mid_block_2", in_ch, in_ch)
    pairs += [(f"{tprefix}.encoder.norm_out", f"{jprefix}/encoder/norm_out",
               "norm"),
              (f"{tprefix}.encoder.conv_out", f"{jprefix}/encoder/conv_out",
               "conv"),
              (f"{tprefix}.quant_conv", f"{jprefix}/quant_conv", "conv"),
              (f"{tprefix}.post_quant_conv", f"{jprefix}/post_quant_conv",
               "conv"),
              (f"{tprefix}.decoder.conv_in", f"{jprefix}/decoder/conv_in",
               "conv")]
    in_ch = ch * ch_mult[-1]
    pairs += _p_vae_res(f"{tprefix}.decoder.mid.block_1",
                        f"{jprefix}/decoder/mid_block_1", in_ch, in_ch)
    pairs += _p_vae_attn(f"{tprefix}.decoder.mid.attn_1",
                         f"{jprefix}/decoder/mid_attn")
    pairs += _p_vae_res(f"{tprefix}.decoder.mid.block_2",
                        f"{jprefix}/decoder/mid_block_2", in_ch, in_ch)
    for level in reversed(range(len(ch_mult))):
        out_ch = ch * ch_mult[level]
        for i in range(nrb + 1):
            pairs += _p_vae_res(f"{tprefix}.decoder.up.{level}.block.{i}",
                                f"{jprefix}/decoder/up_{level}_block_{i}",
                                in_ch, out_ch)
            in_ch = out_ch
        if level != 0:
            pairs.append((f"{tprefix}.decoder.up.{level}.upsample.conv",
                          f"{jprefix}/decoder/up_{level}_upsample", "conv"))
    pairs += [(f"{tprefix}.decoder.norm_out", f"{jprefix}/decoder/norm_out",
               "norm"),
              (f"{tprefix}.decoder.conv_out", f"{jprefix}/decoder/conv_out",
               "conv")]
    return pairs


def sd_clip_pairs(layers=12,
                  tprefix="cond_stage_model.transformer.text_model",
                  jprefix="cond_stage_model"):
    pairs = [(f"{tprefix}.embeddings.token_embedding",
              f"{jprefix}/token_embedding", "embed"),
             (f"{tprefix}.embeddings.position_embedding",
              f"{jprefix}/position_embedding", "pos_embed"),
             (f"{tprefix}.final_layer_norm", f"{jprefix}/ln_final", "norm")]
    for i in range(layers):
        tb = f"{tprefix}.encoder.layers.{i}"
        jb = f"{jprefix}/block_{i}"
        pairs += [(f"{tb}.self_attn", f"{jb}/qkv", "clip_qkv"),
                  (f"{tb}.self_attn.out_proj", f"{jb}/out_proj", "lin"),
                  (f"{tb}.layer_norm1", f"{jb}/ln_1", "norm"),
                  (f"{tb}.layer_norm2", f"{jb}/ln_2", "norm"),
                  (f"{tb}.mlp.fc1", f"{jb}/fc1", "lin"),
                  (f"{tb}.mlp.fc2", f"{jb}/fc2", "lin")]
    return pairs


def sd_controlldm_pairs(cfg, clip_layers=12, vae_ch=128,
                        vae_ch_mult=(1, 2, 4, 4), vae_nrb=2):
    """All (torch_key, jax_path, kind) pairs for a full ControlLDM."""
    return (sd_unet_pairs(cfg, "model.diffusion_model", "diffusion_model")
            + sd_controlnet_pairs(cfg)
            + sd_vae_pairs(vae_ch, vae_ch_mult, vae_nrb)
            + sd_clip_pairs(clip_layers))


def import_sd_controlldm(state: Dict[str, np.ndarray], cfg, clip_layers=12,
                         vae_ch=128, vae_ch_mult=(1, 2, 4, 4), vae_nrb=2,
                         strict: bool = True) -> Dict:
    """Build the flax ControlLDM params tree from an SD+ControlNet torch
    state dict (cldm/model.py load_state_dict layout)."""
    imp = Importer(state)
    tree: Dict = {}

    def tk(key, f=None):
        w = imp.take(key)
        return w if (w is None or f is None) else f(w)

    for tkey, jpath, kind in sd_controlldm_pairs(cfg, clip_layers, vae_ch,
                                                 vae_ch_mult, vae_nrb):
        if kind == "conv":
            imp.put(tree, f"{jpath}/kernel", tk(f"{tkey}.weight", _conv))
            if imp.has(f"{tkey}.bias"):
                imp.put(tree, f"{jpath}/bias", imp.take(f"{tkey}.bias"))
        elif kind == "lin":
            imp.put(tree, f"{jpath}/kernel", tk(f"{tkey}.weight", _lin))
            if imp.has(f"{tkey}.bias"):
                imp.put(tree, f"{jpath}/bias", imp.take(f"{tkey}.bias"))
        elif kind == "lin_nb":
            imp.put(tree, f"{jpath}/kernel", tk(f"{tkey}.weight", _lin))
        elif kind == "conv_as_lin":
            imp.put(tree, f"{jpath}/kernel",
                    tk(f"{tkey}.weight", lambda w: w[:, :, 0, 0].T))
            if imp.has(f"{tkey}.bias"):
                imp.put(tree, f"{jpath}/bias", imp.take(f"{tkey}.bias"))
        elif kind == "norm":
            imp.put(tree, f"{jpath}/scale", imp.take(f"{tkey}.weight"))
            imp.put(tree, f"{jpath}/bias", imp.take(f"{tkey}.bias"))
        elif kind == "embed":
            imp.put(tree, f"{jpath}/embedding", imp.take(f"{tkey}.weight"))
        elif kind == "pos_embed":
            # flax param (not a submodule): position_embedding itself
            imp.put(tree, jpath, imp.take(f"{tkey}.weight"))
        elif kind == "clip_qkv":
            q = tk(f"{tkey}.q_proj.weight", _lin)
            k = tk(f"{tkey}.k_proj.weight", _lin)
            v = tk(f"{tkey}.v_proj.weight", _lin)
            if q is not None and k is not None and v is not None:
                imp.put(tree, f"{jpath}/kernel",
                        np.concatenate([q, k, v], axis=1))
            qb = imp.take(f"{tkey}.q_proj.bias")
            kb = imp.take(f"{tkey}.k_proj.bias")
            vb = imp.take(f"{tkey}.v_proj.bias")
            if qb is not None and kb is not None and vb is not None:
                imp.put(tree, f"{jpath}/bias", np.concatenate([qb, kb, vb]))
        else:
            raise ValueError(f"unknown kind {kind}")
    if strict and imp.missing:
        raise KeyError(f"missing torch keys: {sorted(imp.missing)[:10]} "
                       f"(+{max(0, len(imp.missing) - 10)} more)")
    return tree
