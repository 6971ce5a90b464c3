"""Unified configuration system.

The reference uses three different config stacks (mmcv python-dict configs
with _base_ inheritance, torchpack YAML with ${...} eval, and argparse
constants — SURVEY.md §2.7). Here one system covers all tasks: frozen
dataclasses + named presets (mirroring every DDP config file) + YAML overlay +
dotted-path CLI overrides (`--set model.bit_scale=0.1 optim.lr=1e-4`).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

from .core.diffusion import DiffusionConfig
from .train.optim import OptimConfig


@dataclass(frozen=True)
class ModelConfig:
    task: str = "seg"  # 'seg' | 'depth' | 'bev'
    backbone_type: str = "swin"
    backbone_variant: str = "tiny"
    num_classes: int = 150
    embed_dims: int = 256
    bit_scale: float = 0.01
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    aux_weight: float = 0.4
    drop_path_rate: float = 0.3
    self_aligned: bool = False
    decoder_attn: str = "msda"  # 'msda' | 'window' (TPU-native dense)
    # window grid for decoder_attn='window'; 16 with decoder_heads=4 is the
    # measured-fast shape (work_dirs/decoder_microbench.json: the backward's
    # tiny 8x64x32 per-head matmuls are the decoder's cost — bigger windows
    # and 64-dim heads cut decoder train 29% on v5e)
    decoder_window: int = 8
    decoder_remat: bool = False  # jax.checkpoint decoder layers (train memory)
    loss_at: str = "full"  # 'full' (reference parity) | 'quarter' (TPU-native)
    decoder_film: str = "v1"  # 'v1' | 'v2' | 'v3' FiLM layer variant
    decoder_pos: str = "sine"  # 'sine' | 'learned'
    depth_head_variant: str = "deform"  # 'deform' | 'upconv' | 'spade'
    depth_act: str = "relu"  # 'relu' (torch parity) | 'softplus' (no dead-head)
    decoder_layers: int = 6
    decoder_heads: int = 8
    decoder_ffn_dim: int = 1024
    # depth-specific
    max_depth: float = 10.0
    min_depth: float = 1e-3
    # controlnet-specific (SD 1.5 defaults; 'tiny' scales for synthetic runs)
    cn_size: str = "sd15"  # 'sd15' | 'small' | 'tiny'
    cn_image_size: int = 512
    # latent scale: SD's 0.18215 assumes the SD VAE's latent statistics; a
    # from-scratch VAE needs a data-derived value so scaled latents are
    # ~unit-std (matching the N(0,1) sampling prior — the reference computes
    # it the same way: ldm's scale_factor is 1/std of the first batch's
    # latents). tools/run_convergence.py measures and overrides this.
    cn_scale_factor: float = 0.18215
    # tiny-stack VAE capacity (r4: the VAE recon is the generation CEILING;
    # these are the levers the probe in tools/probe_vae.py measures)
    cn_vae_ch: int = 16
    cn_vae_nrb: int = 1
    # VAE depth: len-1 stride-2 levels -> spatial reduction 2^(len-1).
    # (1, 2, 2, 4) is SD-like 8x; (1, 2, 4) gives a 4x-downsampled latent —
    # r5: the 8x8 latent's recon MSE (~0.011) was the PSNR ceiling (~19.6
    # dB) of the whole generative stack; a 16x16 latent lifts it.
    cn_vae_mult: tuple = (1, 2, 2, 4)
    # bev-specific (defaults = the reference camera-bev256d2 geometry)
    # 6-cam 360° rig like nuScenes: with fewer synthetic cameras most BEV
    # cells are outside every camera frustum and their labels are
    # unlearnable (r3 finding: the 2-cam rig's 160° coverage capped the
    # convergence proof at marginal prediction, mIoU 0)
    bev_num_cams: int = 6
    bev_image_size: Tuple[int, int] = (256, 704)
    bev_out_grid: int = 200
    bev_input_scope: Tuple = ((-51.2, 51.2, 0.8), (-51.2, 51.2, 0.8))
    bev_output_scope: Tuple = ((-50.0, 50.0, 0.5), (-50.0, 50.0, 0.5))
    bev_xbound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    bev_ybound: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    bev_zbound: Tuple[float, float, float] = (-10.0, 10.0, 20.0)
    bev_dbound: Tuple[float, float, float] = (1.0, 60.0, 0.5)
    bev_lss_channels: int = 80
    # depth-bin pruning in the LSS lift (top-k of D bins, 0 = off) — the
    # sensor-rate lever measured in tools/bench_extra.py
    bev_depth_topk: int = 0
    bev_blocks: Tuple = ((2, 160, 2), (2, 320, 2), (2, 640, 1))
    # lidar branch (fusion)
    bev_lidar_channels: int = 128
    bev_lidar_dense_hw: int = 128
    bev_lidar_dense_z: int = 2
    bev_sparse_shape: Tuple[int, int, int] = (1024, 1024, 41)
    bev_voxel_caps: Tuple = (120_000, 60_000, 30_000, 15_000, 15_000)
    bev_voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.2)


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "ade20k"
    data_root: str = "data/ade/ADEChallengeData2016"
    crop_size: Tuple[int, int] = (512, 512)
    batch_size: int = 16  # GLOBAL batch (the reference encodes gpus x per-gpu)
    num_workers: int = 2
    # train-pipeline knobs (mmseg transforms.py semantics)
    ratio_range: Tuple[float, float] = (0.5, 2.0)
    cat_max_ratio: float = 0.75
    flip_prob: float = 0.5
    ignore_index: int = 255
    # normalization (mmseg img_norm_cfg defaults)
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)


@dataclass(frozen=True)
class RuntimeConfig:
    total_iters: int = 160_000
    log_interval: int = 50
    ckpt_interval: int = 16_000
    eval_interval: int = 16_000
    max_keep_ckpts: int = -1
    # best-checkpoint tracking (mmcv save_best + rule; '' disables)
    save_best: str = ""  # metric key, e.g. 'mIoU' or 'abs_rel'
    save_best_mode: str = "max"  # 'max' | 'min'
    tensorboard: bool = True  # write events.out.tfevents scalar curves
    # >1 runs that many train steps per device dispatch as ONE jitted
    # lax.scan over a stacked batch chunk — amortizes host-sync/dispatch
    # latency (decisive through the sandboxed TPU relay; also cuts host overhead on
    # real pods). Intervals are honored at in-chunk resolution.
    steps_per_dispatch: int = 1
    seed: int = 0
    workdir: str = "work_dirs/default"
    mixed_precision: bool = True  # bf16 activations on TPU
    test_mode: str = "whole"  # 'whole' | 'slide'
    test_crop: Tuple[int, int] = (1024, 1024)
    test_stride: Tuple[int, int] = (768, 768)


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    name: str = "custom"


def _replace_path(cfg: Any, dotted: str, value: Any):
    """Immutable deep-replace along a dotted path of dataclass fields."""
    head, _, rest = dotted.partition(".")
    if not dataclasses.is_dataclass(cfg):
        raise KeyError(f"cannot descend into non-dataclass at {head!r}")
    cur = getattr(cfg, head)
    new = _replace_path(cur, rest, value) if rest else _coerce(cur, value)
    return dataclasses.replace(cfg, **{head: new})


def _coerce(old: Any, value: Any):
    if isinstance(value, str) and old is not None and not isinstance(old, str):
        t = type(old)
        if t is bool:
            return value.lower() in ("1", "true", "yes")
        if t is tuple:
            items = [v for v in value.strip("()[] ").split(",") if v]
            inner = type(old[0]) if old else float
            return tuple(inner(v) for v in items)
        return t(value)
    return value


def apply_overrides(cfg: Config, overrides: Dict[str, Any]) -> Config:
    for k, v in overrides.items():
        cfg = _replace_path(cfg, k, v)
    return cfg


def load_yaml_overlay(cfg: Config, path: str) -> Config:
    """Overlay a YAML file of dotted keys or nested dicts onto a preset."""
    import yaml

    with open(path) as f:
        tree = yaml.safe_load(f) or {}

    def flatten(prefix, node, out):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(f"{prefix}{k}." if not prefix else f"{prefix}{k}.", v, out) \
                    if isinstance(v, dict) else out.update({f"{prefix}{k}": v})
        return out

    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            stack = [(k, v)]
            while stack:
                p, node = stack.pop()
                for kk, vv in node.items():
                    if isinstance(vv, dict):
                        stack.append((f"{p}.{kk}", vv))
                    else:
                        flat[f"{p}.{kk}"] = vv
        else:
            flat[k] = v
    return apply_overrides(cfg, flat)


# --- named presets, mirroring the reference's DDP config files -------------

def _seg(name, backbone, variant, dataset, classes, crop, bs, bit_scale,
         timesteps=3, accumulation=True, lr=6e-5, grad_clip=0.1,
         iters=160_000, self_aligned=False, drop_path=0.3,
         decoder_attn="window", **rt):
    # DECODER DECISION (r3, ops/pallas/msda_notes.md): from-scratch TPU
    # training presets default to the dense shifted-window decoder — 6.2x
    # faster inference (18.56 vs 2.98 img/s bf16@b8 on v5e-1), equivalent
    # synthetic convergence (mIoU@3 0.9257 vs 0.9267). 'msda' remains the
    # torch-parity path; tools/import_checkpoint.py forces it because
    # reference checkpoints are MSDA-shaped.
    # SHAPE (r5): window presets ship the measured-fast 16x16 window /
    # 4x64-dim heads (decoder_microbench: -29% decoder train; quality
    # validated equal, converge_seg_w16h4 mIoU@3 0.9273 vs 0.9267). The
    # msda path keeps the reference 8-head shape for weight import.
    win_shape = (dict(decoder_window=16, decoder_heads=4)
                 if decoder_attn == "window" else {})
    return Config(
        name=name,
        model=ModelConfig(
            task="seg", backbone_type=backbone, backbone_variant=variant,
            num_classes=classes, bit_scale=bit_scale, self_aligned=self_aligned,
            drop_path_rate=drop_path, decoder_attn=decoder_attn,
            **win_shape,
            diffusion=DiffusionConfig(timesteps=timesteps, accumulation=accumulation),
        ),
        data=DataConfig(dataset=dataset, crop_size=crop, batch_size=bs,
                        data_root=_DATA_ROOTS.get(dataset, "data")),
        optim=OptimConfig(lr=lr, grad_clip=grad_clip, total_steps=iters),
        runtime=RuntimeConfig(total_iters=iters, **rt),
    )


_DATA_ROOTS = {
    "ade20k": "data/ade/ADEChallengeData2016",
    "cityscapes": "data/cityscapes",
    "nyu": "data/nyu",
    "kitti": "data/kitti",
    "nuscenes": "data/nuscenes",
    "synthetic": "",
}

PRESETS: Dict[str, Any] = {}

# ADE20K Swin family (configs/ade/ddp_swin_{t,s,b,l}_2x8_512x512_160k_ade20k.py)
for _v in ("tiny", "small", "base", "large"):
    PRESETS[f"ade20k_swin_{_v[0]}"] = lambda v=_v: _seg(
        f"ade20k_swin_{v[0]}", "swin", v, "ade20k", 150, (512, 512), 16, 0.01)

# Cityscapes ConvNeXt + Swin families
# (configs/cityscapes/ddp_{convnext,swin}_*_4x4_512x1024_160k_cityscapes.py)
for _b in ("convnext", "swin"):
    for _v in ("tiny", "small", "base", "large"):
        PRESETS[f"cityscapes_{_b}_{_v[0]}"] = lambda b=_b, v=_v: _seg(
            f"cityscapes_{b}_{v[0]}", b, v, "cityscapes", 19, (512, 1024), 16,
            0.01, drop_path=0.4 if b == "convnext" else 0.3)

# Self-aligned fine-tune (configs/cityscapes/ddp_convnext_t_4x4_512x1024_5k_
# cityscapes_aligned.py: timesteps=10, lr 10x lower, 5K iters)
for _v in ("tiny", "large"):
    PRESETS[f"cityscapes_convnext_{_v[0]}_aligned"] = lambda v=_v: _seg(
        f"cityscapes_convnext_{v[0]}_aligned", "convnext", v, "cityscapes", 19,
        (512, 1024), 16, 0.01, timesteps=10, lr=6e-6, iters=5000,
        self_aligned=True, drop_path=0.4)

# Depth: NYU / KITTI Swin families (depth/configs/ddp_{nyu,kitti}/ddp_swin*_
# scale01.py: bit_scale 0.1, 3-step, cosine-annealing lr 6e-5, warmup 12800
# iters ratio 1e-3, grad clip 35, 38400 iters, bs 2x8)
def _depth(name, variant, dataset, max_depth, crop):
    return Config(
        name=name,
        model=ModelConfig(task="depth", backbone_type="swin",
                          backbone_variant=variant, bit_scale=0.1,
                          max_depth=max_depth, min_depth=1e-3,
                          diffusion=DiffusionConfig(timesteps=3, accumulation=False)),
        data=DataConfig(dataset=dataset, crop_size=crop, batch_size=16,
                        data_root=_DATA_ROOTS.get(dataset, "data")),
        optim=OptimConfig(lr=6e-5, grad_clip=35.0, total_steps=38_400,
                          schedule="cosine", warmup_steps=12_800,
                          warmup_ratio=1e-3),
        runtime=RuntimeConfig(total_iters=38_400, ckpt_interval=1600,
                              eval_interval=1600, max_keep_ckpts=2),
    )


for _v in ("tiny", "small", "base", "large"):
    PRESETS[f"nyu_swin_{_v[0]}"] = lambda v=_v: _depth(
        f"nyu_swin_{v[0]}", v, "nyu", 10.0, (416, 544))
    PRESETS[f"kitti_swin_{_v[0]}"] = lambda v=_v: _depth(
        f"kitti_swin_{v[0]}", v, "kitti", 80.0, (352, 704))

# BEV: nuScenes camera-only map segmentation (bev/configs/nuscenes/seg/
# ddp-camera-bev256d2-lss-scale001-d5-lr5e-5.yaml: Swin-T, LSS, 5 decoder
# layers, randsteps 5, bit_scale 0.01, lr 5e-5, clip 35)
PRESETS["nuscenes_camera"] = lambda: Config(
    name="nuscenes_camera",
    model=ModelConfig(task="bev", backbone_type="swin", backbone_variant="tiny",
                      num_classes=6, bit_scale=0.01, decoder_layers=5,
                      decoder_attn="window",  # decoder decision (r3): 40k-token BEV grid
                      diffusion=DiffusionConfig(timesteps=3, randsteps=5)),
    data=DataConfig(dataset="nuscenes", batch_size=8,
                    data_root=_DATA_ROOTS["nuscenes"], crop_size=(256, 704)),
    optim=OptimConfig(lr=5e-5, grad_clip=35.0, total_steps=42_000,
                      schedule="cosine", warmup_steps=1000),
    runtime=RuntimeConfig(total_iters=42_000, ckpt_interval=2000,
                          eval_interval=2000),
)

# --- convergence-proof presets (VERDICT r1 item 1) -------------------------
# Flagship-shaped (swin + FPN + MultiStageMerging + 6-layer time-FiLM
# deformable decoder + aux head + 3-step DDIM rollout) but tiny, trained to
# near-ceiling on the synthetic datasets through the real train() loop.
PRESETS["converge_seg"] = lambda: Config(
    name="converge_seg",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01,
                      diffusion=DiffusionConfig(timesteps=3, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=100, schedule="poly"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg"),
)

# TPU-native dense shifted-window decoder at the same scale — trained to
# show the window path learns equivalently to MSDA (VERDICT r1 item 2)
PRESETS["converge_seg_window"] = lambda: Config(
    name="converge_seg_window",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, decoder_attn="window",
                      diffusion=DiffusionConfig(timesteps=3, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=100, schedule="poly"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_window"),
)

# window-16 / 4-head decoder shape (r5): the measured-fast window-attention
# geometry (decoder_microbench: -29% decoder train vs window-8/8-head) at
# the same rig — trained to show the shape change is quality-neutral before
# it is published as a bench configuration
PRESETS["converge_seg_w16h4"] = lambda: Config(
    name="converge_seg_w16h4",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=4, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, decoder_attn="window", decoder_window=16,
                      diffusion=DiffusionConfig(timesteps=3, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=100, schedule="poly"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1,
                          steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_w16h4"),
)

# quarter-res CE variant (model.loss_at='quarter'): everything identical to
# converge_seg except where the loss is computed — published next to it as
# the measured quality cost behind the bench's quarter_loss row (r4:
# +32% steps/s but mIoU@3 0.841 vs full-res 0.927 — the full-res CE's
# sub-latent-cell boundary supervision is real; full stays the default)
PRESETS["converge_seg_quarter"] = lambda: Config(
    name="converge_seg_quarter",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, loss_at="quarter",
                      diffusion=DiffusionConfig(timesteps=3, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=100, schedule="poly"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_quarter"),
)

# msda-decoder twin of converge_seg: the torch-parity deformable-attention
# path, trained END-TO-END through the hybrid custom-VJP (window forward /
# 4-corner backward, ops/pallas/msda_train_notes.md) — the base checkpoint
# for the on-chip self-aligned msda fine-tune (reference recipe
# self_aligned_ddp.py:49-186 applies to an msda model)
PRESETS["converge_seg_msda"] = lambda: Config(
    name="converge_seg_msda",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, decoder_attn="msda",
                      diffusion=DiffusionConfig(timesteps=3, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=100, schedule="poly"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1,
                          steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_msda"),
)

# self-aligned fine-tune on the MSDA decoder (VERDICT r4 missing #2: the
# capability the hybrid VJP was built for — reference fine-tunes an msda
# checkpoint with type='SelfAlignedDDP', timesteps=10, 10x lower lr,
# configs/cityscapes/ddp_convnext_t_4x4_512x1024_5k_cityscapes_aligned.py)
PRESETS["converge_seg_aligned_msda"] = lambda: Config(
    name="converge_seg_aligned_msda",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, decoder_attn="msda", self_aligned=True,
                      diffusion=DiffusionConfig(timesteps=10, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-5, grad_clip=1.0, total_steps=300, warmup_steps=0,
                      schedule="poly"),
    runtime=RuntimeConfig(total_iters=300, log_interval=50, ckpt_interval=300,
                          eval_interval=10_000, max_keep_ckpts=1,
                          steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_aligned_msda"),
)

# self-aligned fine-tune from the converge_seg checkpoint (reference recipe:
# type='SelfAlignedDDP', timesteps=10, 10x lower lr, short schedule)
PRESETS["converge_seg_aligned"] = lambda: Config(
    name="converge_seg_aligned",
    model=ModelConfig(task="seg", backbone_type="swin", backbone_variant="nano",
                      num_classes=7, embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.01, self_aligned=True,
                      diffusion=DiffusionConfig(timesteps=10, accumulation=True)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    optim=OptimConfig(lr=3e-5, grad_clip=1.0, total_steps=300, warmup_steps=0,
                      schedule="poly"),
    runtime=RuntimeConfig(total_iters=300, log_interval=50, ckpt_interval=300,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_seg_aligned"),
)

PRESETS["converge_depth"] = lambda: Config(
    name="converge_depth",
    model=ModelConfig(task="depth", backbone_type="swin",
                      backbone_variant="nano", embed_dims=64, decoder_layers=6,
                      decoder_heads=8, decoder_ffn_dim=256, drop_path_rate=0.0,
                      bit_scale=0.1, max_depth=10.0, depth_act="softplus",
                      diffusion=DiffusionConfig(timesteps=3, accumulation=False)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    # relu+eps depth output dies at aggressive lr (zero grads observed at
    # 3e-4); 1e-4 with a longer warmup keeps the head alive
    optim=OptimConfig(lr=1e-4, grad_clip=1.0, total_steps=1500,
                      warmup_steps=300, schedule="cosine"),
    runtime=RuntimeConfig(total_iters=1500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_depth"),
)

PRESETS["converge_bev"] = lambda: Config(
    name="converge_bev",
    model=ModelConfig(task="bev", backbone_type="swin", backbone_variant="nano",
                      num_classes=3, embed_dims=48, decoder_layers=5,
                      decoder_heads=8, decoder_ffn_dim=192, drop_path_rate=0.0,
                      bit_scale=0.01,
                      diffusion=DiffusionConfig(timesteps=3, randsteps=5),
                      bev_image_size=(32, 64), bev_out_grid=20,
                      bev_input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
                      bev_output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
                      bev_xbound=(-8.0, 8.0, 0.5), bev_ybound=(-8.0, 8.0, 0.5),
                      bev_dbound=(1.0, 9.0, 1.0), bev_lss_channels=24,
                      bev_blocks=((1, 32, 2), (1, 48, 1))),
    data=DataConfig(dataset="synthetic", batch_size=16, crop_size=(32, 64)),
    # r3: lr 3e-4/1200 it underfit (loss plateau 0.031, all-background
    # collapse, mIoU 0); the 8-sample overfit probe at lr 1e-3 reaches
    # mIoU 0.83 in 400 steps — train hotter and longer
    optim=OptimConfig(lr=1e-3, grad_clip=5.0, total_steps=2500,
                      warmup_steps=100, schedule="cosine"),
    runtime=RuntimeConfig(total_iters=2500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1, steps_per_dispatch=10,
                          workdir="work_dirs/converge_bev"),
)

# Fusion convergence: the full camera+lidar path (voxelizer -> rulebook
# spconv -> ConvFuser -> diffusion head) trained end-to-end on synthetic
# points + rig (VERDICT r2 missing #1 — the most complex subsystem gets
# convergence proof, not just unit tests)
PRESETS["converge_bev_fusion"] = lambda: Config(
    name="converge_bev_fusion",
    model=ModelConfig(task="bev_fusion", backbone_type="swin",
                      backbone_variant="nano", num_classes=3, embed_dims=48,
                      decoder_layers=5, decoder_heads=8, decoder_ffn_dim=192,
                      drop_path_rate=0.0, bit_scale=0.01,
                      diffusion=DiffusionConfig(timesteps=3, randsteps=5),
                      bev_image_size=(32, 64), bev_out_grid=20,
                      bev_input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
                      bev_output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
                      bev_xbound=(-8.0, 8.0, 0.5), bev_ybound=(-8.0, 8.0, 0.5),
                      bev_dbound=(1.0, 9.0, 1.0), bev_lss_channels=24,
                      bev_blocks=((1, 32, 2), (1, 48, 1)),
                      bev_lidar_channels=32, bev_lidar_dense_hw=16,
                      bev_lidar_dense_z=2, bev_sparse_shape=(128, 128, 41),
                      bev_voxel_caps=(1024, 512, 256, 128, 128),
                      bev_voxel_size=(0.125, 0.125, 0.2)),
    data=DataConfig(dataset="synthetic", batch_size=16, crop_size=(32, 64)),
    # r4: match the camera preset's treatment (lr 1e-3 / 2500 it) — the r3
    # 3e-4/1200 run reproduced exactly the underfit the camera preset's own
    # comment records (t=1 regime never learned: train mIoU@1 0.003); plus
    # active-row masked BN in the sparse stack (diagnosis.json: lidar branch
    # contributed only 0.02 mIoU under padded-row BN stats)
    optim=OptimConfig(lr=1e-3, grad_clip=5.0, total_steps=2500,
                      warmup_steps=100, schedule="cosine"),
    runtime=RuntimeConfig(total_iters=2500, log_interval=100, ckpt_interval=500,
                          eval_interval=10_000, max_keep_ckpts=1,
                          steps_per_dispatch=10,
                          workdir="work_dirs/converge_bev_fusion"),
)

PRESETS["converge_controlnet"] = lambda: Config(
    name="converge_controlnet",
    model=ModelConfig(task="controlnet", cn_size="small", cn_image_size=64,
                      # r5: 4x-downsampled 16x16 latent — the r4 8x8
                      # latent's held-out recon MSE 0.011 capped the whole
                      # stack at ~19.6 dB PSNR no matter how long the UNet
                      # trained (vae_probe.json); a shallower first stage
                      # raises the generation ceiling, the SD recipe
                      # unchanged otherwise.
                      cn_vae_mult=(1, 2, 4)),
    data=DataConfig(dataset="synthetic", crop_size=(64, 64), batch_size=16),
    # VAE is stage-1 pretrained (tools/run_convergence.py:pretrain_vae) and
    # frozen here, mirroring the reference's frozen SD first stage.
    # r3: 600 iters left eps-loss at 0.14 and generations unrecognizable.
    # r4: the 'tiny' UNet (32ch) plateaued at 10 dB PSNR over 5200 iters —
    # capacity, latent scaling (cn_scale_factor, measured per-run) and
    # budget moved together to 'small'/16k -> 20.35 dB. r5: 40k iters on
    # the 16x16 latent (~4x the UNet tokens; minutes of chip time on the
    # on-device trainer).
    optim=OptimConfig(lr=2e-4, grad_clip=1.0, total_steps=40_000,
                      warmup_steps=100, schedule="cosine",
                      custom_keys=(("first_stage_model", (0.0, 0.0)),)),
    runtime=RuntimeConfig(total_iters=40_000, log_interval=200,
                          ckpt_interval=2000, eval_interval=100_000,
                          max_keep_ckpts=1, steps_per_dispatch=20,
                          workdir="work_dirs/converge_controlnet"),
)

# Full SD 1.5 ControlNet fine-tune (tutorial_train.py: lr 1e-5, sd locked —
# the frozen stack is expressed as lr_mult 0 optimizer rules)
PRESETS["controlnet_sd15"] = lambda: Config(
    name="controlnet_sd15",
    model=ModelConfig(task="controlnet", cn_size="sd15", cn_image_size=512),
    data=DataConfig(dataset="fill50k", data_root="data/fill50k",
                    crop_size=(512, 512), batch_size=4),
    optim=OptimConfig(lr=1e-5, grad_clip=1.0, total_steps=100_000,
                      schedule="constant", warmup_steps=0,
                      custom_keys=(("diffusion_model", (0.0, 0.0)),
                                   ("first_stage_model", (0.0, 0.0)),
                                   ("cond_stage_model", (0.0, 0.0)))),
    runtime=RuntimeConfig(total_iters=100_000, ckpt_interval=5000,
                          eval_interval=1_000_000,
                          workdir="work_dirs/controlnet_sd15"),
)

# tiny CPU-runnable smoke preset
PRESETS["smoke"] = lambda: Config(
    name="smoke",
    model=ModelConfig(task="seg", backbone_type="convnext",
                      backbone_variant="nano", num_classes=7, embed_dims=32,
                      decoder_layers=2, decoder_heads=4, decoder_ffn_dim=64,
                      drop_path_rate=0.0,
                      diffusion=DiffusionConfig(timesteps=2)),
    data=DataConfig(dataset="synthetic", crop_size=(32, 32), batch_size=8),
    optim=OptimConfig(lr=1e-3, total_steps=100, warmup_steps=10, grad_clip=1.0),
    runtime=RuntimeConfig(total_iters=100, log_interval=10, ckpt_interval=50,
                          eval_interval=50, workdir="work_dirs/smoke"),
)


# Fusion: camera + lidar (bev/configs/nuscenes/seg/ddp-fusion-bev256d2-...)
PRESETS["nuscenes_fusion"] = lambda: Config(
    name="nuscenes_fusion",
    model=ModelConfig(task="bev_fusion", backbone_type="swin",
                      backbone_variant="tiny", num_classes=6, bit_scale=0.01,
                      decoder_layers=5, decoder_attn="window",
                      diffusion=DiffusionConfig(timesteps=3, randsteps=5)),
    data=DataConfig(dataset="nuscenes", batch_size=8,
                    data_root=_DATA_ROOTS["nuscenes"], crop_size=(256, 704)),
    optim=OptimConfig(lr=5e-5, grad_clip=35.0, total_steps=42_000,
                      schedule="cosine", warmup_steps=1000),
    runtime=RuntimeConfig(total_iters=42_000, ckpt_interval=2000,
                          eval_interval=2000),
)

PRESETS["smoke_fusion"] = lambda: Config(
    name="smoke_fusion",
    model=ModelConfig(task="bev_fusion", backbone_type="swin",
                      backbone_variant="nano", num_classes=3, embed_dims=32,
                      decoder_layers=1, decoder_heads=4, decoder_ffn_dim=64,
                      drop_path_rate=0.0,
                      diffusion=DiffusionConfig(timesteps=2, randsteps=1),
                      bev_num_cams=2, bev_image_size=(32, 64), bev_out_grid=20,
                      bev_input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
                      bev_output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
                      bev_xbound=(-8.0, 8.0, 0.5), bev_ybound=(-8.0, 8.0, 0.5),
                      bev_dbound=(1.0, 9.0, 1.0), bev_lss_channels=16,
                      bev_blocks=((1, 24, 2), (1, 32, 1)),
                      bev_lidar_channels=24, bev_lidar_dense_hw=16,
                      bev_lidar_dense_z=2, bev_sparse_shape=(128, 128, 41),
                      bev_voxel_caps=(512, 256, 128, 96, 96),
                      bev_voxel_size=(0.125, 0.125, 0.2)),
    data=DataConfig(dataset="synthetic", batch_size=4, crop_size=(32, 64)),
    optim=OptimConfig(lr=1e-3, total_steps=40, warmup_steps=5, grad_clip=5.0),
    runtime=RuntimeConfig(total_iters=40, log_interval=10, ckpt_interval=40,
                          eval_interval=1000, workdir="work_dirs/smoke_fusion"),
)

PRESETS["smoke_bev"] = lambda: Config(
    name="smoke_bev",
    model=ModelConfig(task="bev", backbone_type="swin", backbone_variant="nano",
                      num_classes=3, embed_dims=32, decoder_layers=1,
                      decoder_heads=4, decoder_ffn_dim=64, drop_path_rate=0.0,
                      diffusion=DiffusionConfig(timesteps=2, randsteps=2),
                      bev_num_cams=2, bev_image_size=(32, 64), bev_out_grid=20,
                      bev_input_scope=((-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)),
                      bev_output_scope=((-8.0, 8.0, 0.8), (-8.0, 8.0, 0.8)),
                      bev_xbound=(-8.0, 8.0, 0.5), bev_ybound=(-8.0, 8.0, 0.5),
                      bev_dbound=(1.0, 9.0, 1.0), bev_lss_channels=16,
                      bev_blocks=((1, 24, 2), (1, 32, 1))),
    data=DataConfig(dataset="synthetic", batch_size=4, crop_size=(32, 64)),
    optim=OptimConfig(lr=1e-3, total_steps=60, warmup_steps=5, grad_clip=5.0),
    runtime=RuntimeConfig(total_iters=60, log_interval=10, ckpt_interval=30,
                          eval_interval=1000, workdir="work_dirs/smoke_bev"),
)


def get_config(name: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    cfg = PRESETS[name]()
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def build_model(mc: ModelConfig):
    """Model factory from config (the reference's registry builder role)."""
    if mc.task == "seg":
        from .models.segmentor import DDPSegmentor

        return DDPSegmentor(
            num_classes=mc.num_classes,
            backbone_type=mc.backbone_type,
            backbone_variant=mc.backbone_variant,
            embed_dims=mc.embed_dims,
            bit_scale=mc.bit_scale,
            diffusion=mc.diffusion,
            aux_weight=mc.aux_weight,
            drop_path_rate=mc.drop_path_rate,
            decoder_layers=mc.decoder_layers,
            decoder_heads=mc.decoder_heads,
            decoder_ffn_dim=mc.decoder_ffn_dim,
            decoder_attn=mc.decoder_attn,
            decoder_window=mc.decoder_window,
            decoder_film=mc.decoder_film,
            decoder_pos=mc.decoder_pos,
            self_aligned=mc.self_aligned,
            decoder_remat=mc.decoder_remat,
            loss_at=mc.loss_at,
        )
    if mc.task == "bev":
        from .models.bev import DDPBEVCamera

        return DDPBEVCamera(
            num_classes=mc.num_classes,
            embed_dims=mc.embed_dims,
            bit_scale=mc.bit_scale,
            diffusion=mc.diffusion,
            backbone_variant=mc.backbone_variant,
            decoder_layers=mc.decoder_layers,
            decoder_heads=mc.decoder_heads,
            decoder_ffn_dim=mc.decoder_ffn_dim,
            decoder_attn=mc.decoder_attn,
            drop_path_rate=mc.drop_path_rate,
            image_size=mc.bev_image_size,
            out_grid=mc.bev_out_grid,
            input_scope=mc.bev_input_scope,
            output_scope=mc.bev_output_scope,
            xbound=mc.bev_xbound,
            ybound=mc.bev_ybound,
            zbound=mc.bev_zbound,
            dbound=mc.bev_dbound,
            lss_out_channels=mc.bev_lss_channels,
            depth_topk=mc.bev_depth_topk,
            bev_blocks=mc.bev_blocks,
        )
    if mc.task == "bev_fusion":
        from .models.bev_fusion import DDPBEVFusion

        return DDPBEVFusion(
            num_classes=mc.num_classes,
            embed_dims=mc.embed_dims,
            bit_scale=mc.bit_scale,
            diffusion=mc.diffusion,
            backbone_variant=mc.backbone_variant,
            decoder_layers=mc.decoder_layers,
            decoder_heads=mc.decoder_heads,
            decoder_ffn_dim=mc.decoder_ffn_dim,
            decoder_attn=mc.decoder_attn,
            drop_path_rate=mc.drop_path_rate,
            image_size=mc.bev_image_size,
            out_grid=mc.bev_out_grid,
            input_scope=mc.bev_input_scope,
            output_scope=mc.bev_output_scope,
            xbound=mc.bev_xbound,
            ybound=mc.bev_ybound,
            zbound=mc.bev_zbound,
            dbound=mc.bev_dbound,
            lss_out_channels=mc.bev_lss_channels,
            depth_topk=mc.bev_depth_topk,
            bev_blocks=mc.bev_blocks,
            lidar_channels=mc.bev_lidar_channels,
            lidar_dense_hw=mc.bev_lidar_dense_hw,
            lidar_dense_z=mc.bev_lidar_dense_z,
        )
    if mc.task == "controlnet":
        from .models.controlnet import ControlNetTrainer
        from .nn.unet import UNetConfig

        if mc.cn_size in ("tiny", "small"):
            unet = (UNetConfig().tiny() if mc.cn_size == "tiny"
                    else UNetConfig().small())
            return ControlNetTrainer(unet=unet, clip_width=64,
                                     clip_layers=2, clip_vocab=512,
                                     vae_ch=mc.cn_vae_ch,
                                     vae_ch_mult=tuple(mc.cn_vae_mult),
                                     vae_nrb=mc.cn_vae_nrb,
                                     scale_factor=mc.cn_scale_factor,
                                     )
        return ControlNetTrainer(unet=UNetConfig(),
                                 scale_factor=mc.cn_scale_factor)

    if mc.task == "depth":
        from .models.depther import DDPDepther

        return DDPDepther(
            backbone_type=mc.backbone_type,
            backbone_variant=mc.backbone_variant,
            embed_dims=mc.embed_dims,
            bit_scale=mc.bit_scale,
            diffusion=mc.diffusion,
            drop_path_rate=mc.drop_path_rate,
            decoder_layers=mc.decoder_layers,
            decoder_heads=mc.decoder_heads,
            decoder_ffn_dim=mc.decoder_ffn_dim,
            head_variant=mc.depth_head_variant, depth_act=mc.depth_act,
            decoder_remat=mc.decoder_remat,
            max_depth=mc.max_depth,
            min_depth=mc.min_depth,
        )
    raise ValueError(f"unknown task {mc.task!r}")
