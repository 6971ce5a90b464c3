"""Torch→JAX weight import: numerics parity (torch replicas of the mmseg
module math vs our flax modules with converted weights) and a full structural
roundtrip of the DDP segmentor mapping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddp_tpu.train import torch_import as TI

pytestmark = pytest.mark.slow


def to_np(t):
    return t.detach().numpy()


class TestWindowAttentionParity:
    def test_matches_torch_window_msa(self):
        """Replicates mmseg WindowMSA math in torch (qkv packing, rel-pos
        bias indexing), converts weights, compares to flax WindowAttention."""
        import torch
        import torch.nn as nn

        torch.manual_seed(0)
        C, H_heads, win = 16, 4, 4
        N = win * win
        qkv = nn.Linear(C, 3 * C)
        proj = nn.Linear(C, C)
        table = torch.randn((2 * win - 1) ** 2, H_heads) * 0.1

        # mmseg relative_position_index construction
        coords = torch.stack(torch.meshgrid(torch.arange(win), torch.arange(win),
                                            indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += win - 1
        rel[:, :, 1] += win - 1
        rel[:, :, 0] *= 2 * win - 1
        idx = rel.sum(-1)

        x = torch.randn(2, N, C)
        B = x.shape[0]
        d = C // H_heads
        qkv_out = qkv(x).reshape(B, N, 3, H_heads, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv_out[0], qkv_out[1], qkv_out[2]
        q = q * (d ** -0.5)
        attn = q @ k.transpose(-2, -1)
        bias = table[idx.view(-1)].view(N, N, H_heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        attn = attn.softmax(-1)
        ref = (attn @ v).transpose(1, 2).reshape(B, N, C)
        ref = to_np(proj(ref))

        from ddp_tpu.nn.swin import WindowAttention

        params = {
            "qkv": {"kernel": TI._lin(to_np(qkv.weight)), "bias": to_np(qkv.bias)},
            "proj": {"kernel": TI._lin(to_np(proj.weight)), "bias": to_np(proj.bias)},
            "relative_position_bias_table": to_np(table),
        }
        mod = WindowAttention(C, H_heads, win)
        got = mod.apply({"params": params}, jnp.asarray(to_np(x)), None)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


class TestPatchMergingParity:
    def test_matches_torch_unfold_merge(self):
        import torch
        import torch.nn as nn
        import torch.nn.functional as F

        torch.manual_seed(1)
        C, H, W = 6, 4, 6
        norm = nn.LayerNorm(4 * C)
        red = nn.Linear(4 * C, 2 * C, bias=False)
        x = torch.randn(2, H, W, C)
        # mmseg PatchMerging: NCHW unfold k=2 s=2 → [B, 4C, L] → [B, L, 4C]
        xt = x.permute(0, 3, 1, 2)
        u = F.unfold(xt, kernel_size=2, stride=2).transpose(1, 2)
        ref = to_np(red(norm(u))).reshape(2, H // 2, W // 2, 2 * C)

        from ddp_tpu.nn.swin import PatchMerging

        params = {
            "norm": {"scale": TI._merge_perm(to_np(norm.weight), C),
                     "bias": TI._merge_perm(to_np(norm.bias), C)},
            "reduction": {"kernel": TI._merge_perm(TI._lin(to_np(red.weight)), C)},
        }
        got = PatchMerging(2 * C).apply({"params": params}, jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


class TestConvNeXtBlockParity:
    def test_matches_torch_block(self):
        import torch
        import torch.nn as nn

        torch.manual_seed(2)
        C = 8
        dw = nn.Conv2d(C, C, 7, padding=3, groups=C)
        norm = nn.LayerNorm(C, eps=1e-6)
        pw1 = nn.Linear(C, 4 * C)
        pw2 = nn.Linear(4 * C, C)
        gamma = torch.randn(C) * 1e-2
        x = torch.randn(1, C, 10, 12)
        y = dw(x).permute(0, 2, 3, 1)
        y = norm(y)
        y = pw2(torch.nn.functional.gelu(pw1(y)))
        ref = to_np(x.permute(0, 2, 3, 1) + gamma * y)

        from ddp_tpu.nn.convnext import ConvNeXtBlock

        params = {
            "dwconv": {"kernel": TI._dw_conv(to_np(dw.weight)), "bias": to_np(dw.bias)},
            "norm": {"scale": to_np(norm.weight), "bias": to_np(norm.bias)},
            "pwconv1": {"kernel": TI._lin(to_np(pw1.weight)), "bias": to_np(pw1.bias)},
            "pwconv2": {"kernel": TI._lin(to_np(pw2.weight)), "bias": to_np(pw2.bias)},
            "gamma": to_np(gamma),
        }
        got = ConvNeXtBlock(C, drop_path=0.0).apply(
            {"params": params}, jnp.asarray(to_np(x.permute(0, 2, 3, 1))))
        # torch gelu default is exact erf; flax nn.gelu default approximate
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def _synth_torch_state_for(variables, backbone="swin", variant="nano",
                           decoder_layers=2):
    """Reverse-engineer a torch-style state_dict covering exactly the keys the
    importer consumes, with shapes derived from the flax tree."""
    rng = np.random.RandomState(0)
    state = {}

    def rand(shape):
        return rng.randn(*shape).astype(np.float32) * 0.02

    p = variables["params"]

    def walk_expected():
        # swin backbone
        from ddp_tpu.nn.swin import swin_variant

        kw = swin_variant(variant)
        depths = kw["depths"]
        dims = [kw["embed_dims"] * 2 ** i for i in range(4)]
        bb = p["backbone"]
        state["backbone.patch_embed.projection.weight"] = rand(
            (dims[0], 3, 4, 4))
        state["backbone.patch_embed.projection.bias"] = rand((dims[0],))
        state["backbone.patch_embed.norm.weight"] = rand((dims[0],))
        state["backbone.patch_embed.norm.bias"] = rand((dims[0],))
        for si, depth in enumerate(depths):
            c = dims[si]
            for bi in range(depth):
                t = f"backbone.stages.{si}.blocks.{bi}"
                jb = bb[f"stage{si}_block{bi}"]
                for nrm in ("norm1", "norm2"):
                    state[f"{t}.{nrm}.weight"] = rand((c,))
                    state[f"{t}.{nrm}.bias"] = rand((c,))
                tbl = jb["attn"]["relative_position_bias_table"]
                state[f"{t}.attn.w_msa.relative_position_bias_table"] = rand(
                    tuple(tbl.shape))
                state[f"{t}.attn.w_msa.qkv.weight"] = rand((3 * c, c))
                state[f"{t}.attn.w_msa.qkv.bias"] = rand((3 * c,))
                state[f"{t}.attn.w_msa.proj.weight"] = rand((c, c))
                state[f"{t}.attn.w_msa.proj.bias"] = rand((c,))
                hid = jb["ffn"]["Dense_0"]["kernel"].shape[1]
                state[f"{t}.ffn.layers.0.0.weight"] = rand((hid, c))
                state[f"{t}.ffn.layers.0.0.bias"] = rand((hid,))
                state[f"{t}.ffn.layers.1.weight"] = rand((c, hid))
                state[f"{t}.ffn.layers.1.bias"] = rand((c,))
            if si < 3:
                t = f"backbone.stages.{si}.downsample"
                state[f"{t}.norm.weight"] = rand((4 * c,))
                state[f"{t}.norm.bias"] = rand((4 * c,))
                state[f"{t}.reduction.weight"] = rand((2 * c, 4 * c))
            state[f"backbone.norm{si}.weight"] = rand((dims[si],))
            state[f"backbone.norm{si}.bias"] = rand((dims[si],))
        # neck
        emb = p["neck_merge"]["down"]["Conv_0"]["kernel"].shape[-1]
        for i in range(4):
            cin = p["neck_fpn"][f"lateral{i}"]["Conv_0"]["kernel"].shape[2]
            state[f"neck.0.lateral_convs.{i}.conv.weight"] = rand((emb, cin, 1, 1))
            state[f"neck.0.lateral_convs.{i}.bn.weight"] = rand((emb,))
            state[f"neck.0.lateral_convs.{i}.bn.bias"] = rand((emb,))
            state[f"neck.0.fpn_convs.{i}.conv.weight"] = rand((emb, emb, 3, 3))
            state[f"neck.0.fpn_convs.{i}.bn.weight"] = rand((emb,))
            state[f"neck.0.fpn_convs.{i}.bn.bias"] = rand((emb,))
        state["neck.1.down.conv.weight"] = rand((emb, 4 * emb, 1, 1))
        state["neck.1.down.bn.weight"] = rand((emb,))
        state["neck.1.down.bn.bias"] = rand((emb,))
        # decode head
        k = p["decode_head"]["conv_seg"]["kernel"].shape[-1]
        state["decode_head.conv_seg.weight"] = rand((k, emb, 1, 1))
        state["decode_head.conv_seg.bias"] = rand((k,))
        for i in range(decoder_layers):
            t = f"decode_head.encoder.layers.{i}"
            jl = p["decode_head"]["encoder"][f"layer{i}"]
            for name in ("sampling_offsets", "attention_weights", "value_proj",
                         "output_proj"):
                kern = jl["attn"][name]["kernel"]
                state[f"{t}.attentions.0.{name}.weight"] = rand(
                    (kern.shape[1], kern.shape[0]))
                state[f"{t}.attentions.0.{name}.bias"] = rand((kern.shape[1],))
            hid = jl["ffn"]["Dense_0"]["kernel"].shape[1]
            state[f"{t}.ffns.0.layers.0.0.weight"] = rand((hid, emb))
            state[f"{t}.ffns.0.layers.0.0.bias"] = rand((hid,))
            state[f"{t}.ffns.0.layers.1.weight"] = rand((emb, hid))
            state[f"{t}.ffns.0.layers.1.bias"] = rand((emb,))
            for ni, nrm in enumerate(("norms.0", "norms.1")):
                state[f"{t}.{nrm}.weight"] = rand((emb,))
                state[f"{t}.{nrm}.bias"] = rand((emb,))
            tm = jl["time_mlp"]["kernel"]
            state[f"{t}.time_mlp.1.weight"] = rand((tm.shape[1], tm.shape[0]))
            state[f"{t}.time_mlp.1.bias"] = rand((tm.shape[1],))
        # aux head
        state["auxiliary_head.convs.0.conv.weight"] = rand((emb, emb, 3, 3))
        state["auxiliary_head.convs.0.bn.weight"] = rand((emb,))
        state["auxiliary_head.convs.0.bn.bias"] = rand((emb,))
        state["auxiliary_head.convs.0.bn.running_mean"] = rand((emb,))
        state["auxiliary_head.convs.0.bn.running_var"] = np.abs(rand((emb,))) + 1
        state["auxiliary_head.conv_seg.weight"] = rand((k, emb, 1, 1))
        state["auxiliary_head.conv_seg.bias"] = rand((k,))
        # diffusion bits
        et = p["embedding_table"]["embedding"]
        state["embedding_table.weight"] = rand(tuple(et.shape))
        state["transform.conv.weight"] = rand((emb, 2 * emb, 1, 1))
        state["transform.conv.bias"] = rand((emb,))
        state["time_mlp.0.weights"] = rand(
            tuple(p["time_mlp"]["LearnedSinusoidalPosEmb_0"]["weights"].shape))
        td = p["time_mlp"]["Dense_0"]["kernel"]
        state["time_mlp.1.weight"] = rand((td.shape[1], td.shape[0]))
        state["time_mlp.1.bias"] = rand((td.shape[1],))
        td = p["time_mlp"]["Dense_1"]["kernel"]
        state["time_mlp.3.weight"] = rand((td.shape[1], td.shape[0]))
        state["time_mlp.3.bias"] = rand((td.shape[1],))

    walk_expected()
    return state


def test_full_import_roundtrip_structure():
    """Importer output must cover the model's param tree exactly: same tree
    paths, same shapes, no missing or unused torch keys."""
    from ddp_tpu.core.diffusion import DiffusionConfig
    from ddp_tpu.models.segmentor import DDPSegmentor

    model = DDPSegmentor(num_classes=5, backbone_type="swin",
                         backbone_variant="nano", embed_dims=32,
                         decoder_layers=2, decoder_heads=4, decoder_ffn_dim=64,
                         diffusion=DiffusionConfig(timesteps=1),
                         drop_path_rate=0.0)
    img = jnp.zeros((1, 32, 32, 3))
    gt = jnp.zeros((1, 32, 32), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, img, gt, train=False)

    state = _synth_torch_state_for(variables, decoder_layers=2)
    imported, report = TI.import_ddp_seg(state, "swin", "nano", decoder_layers=2)
    assert report["missing"] == [], report["missing"][:10]
    assert report["unused"] == [], report["unused"][:10]

    # identical tree structure + shapes for params
    flat_w = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_g = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_flatten_with_path(imported["params"])[0]}
    for path, arr in flat_w:
        key = jax.tree_util.keystr(path)
        assert key in flat_g, f"missing imported param {key}"
        assert tuple(flat_g[key].shape) == tuple(arr.shape), (
            key, flat_g[key].shape, arr.shape)
    assert len(flat_g) == len(flat_w)

    # imported variables must actually run through the model
    rest = {k: v for k, v in variables.items() if k not in imported}
    out = model.apply({**imported, **rest}, img, gt, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(3)})
    assert np.isfinite(float(out[0]))
