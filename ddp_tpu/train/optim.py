"""Optimizer + LR schedule factory.

Parity targets:
  - AdamW lr 6e-5, betas (0.9, 0.999), wd 0.01 with paramwise custom_keys
    (decay_mult / lr_mult by substring match on the parameter path) —
    configs/ade/ddp_swin_t...py:115-127.
  - poly LR power 1.0 + linear warmup 1500 iters ratio 1e-6
    (configs/ade/...py:128-136); CosineAnnealing for depth
    (depth/configs/ddp_nyu/...py:126-132).
  - grad clip by global norm (max_norm 0.1 ADE / 35 depth+BEV) —
    optimizer_config in the same configs.

Implemented as one optax chain; paramwise rules become optax masks keyed by
the flattened parameter path, so XLA sees a single fused update.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 6e-5
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    grad_clip: float = 0.1
    # substring -> (lr_mult, decay_mult); first match wins (mmseg semantics)
    custom_keys: Tuple[Tuple[str, Tuple[float, float]], ...] = (
        ("pos_block", (1.0, 0.0)),
        ("norm", (1.0, 0.0)),
        ("relative_position_bias_table", (1.0, 0.0)),
        ("head", (1.0, 1.0)),
    )
    # schedule
    schedule: str = "poly"  # 'poly' | 'cosine' | 'constant' | 'cyclic'
    total_steps: int = 160_000
    warmup_steps: int = 1500
    warmup_ratio: float = 1e-6
    power: float = 1.0
    min_lr: float = 0.0
    # cyclic (one-cycle) knobs — the BEV schedule (bev/configs/nuscenes/
    # seg/default.yaml lr_config/momentum_config: target_ratio (10, 1e-4),
    # step_ratio_up 0.4, cyclic momentum (0.8947, 1) around b1)
    cyclic_target_ratio: Tuple[float, float] = (10.0, 1e-4)
    cyclic_step_ratio_up: float = 0.4
    cyclic_momentum: bool = True
    cyclic_momentum_ratio: Tuple[float, float] = (0.8947368421, 1.0)
    # layer-wise lr decay (reference LearningRateDecayOptimizerConstructor,
    # mmseg/core/optimizers/layer_decay_optimizer_constructor.py:103 — shipped
    # by the reference but unused by DDP configs). None disables.
    layer_decay_rate: Optional[float] = None
    layer_decay_num_layers: int = 12


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _rule_for(path: str, leaf, custom_keys) -> Tuple[float, float]:
    """(lr_mult, decay_mult) for a parameter path. Custom keys are matched
    first (mmseg custom_keys semantics, first match wins); additionally ALL
    1-D params (biases, norm scales) are exempt from weight decay — the
    reference achieves this via its 'norm' custom key, we make it structural."""
    lr_mult, decay_mult = 1.0, 1.0
    for key, (lm, dm) in custom_keys:
        if key in path:
            lr_mult, decay_mult = lm, dm
            break
    if leaf.ndim <= 1:
        decay_mult = 0.0
    return lr_mult, decay_mult


def layer_id_for_path(path: str, num_layers: int) -> int:
    """Layer id of a parameter for layer-wise lr decay, adapted to this
    package's module naming (reference get_layer_id_for_convnext /
    get_layer_id_for_vit, layer_decay_optimizer_constructor.py:11-101).

    ConvNeXt paths look like ``backbone/stage{S}_block{B}/...`` and
    ``backbone/stem_*`` / ``backbone/down_*{S}``; ViT-style backbones use
    ``backbone/layers_{i}`` or ``.../block{i}/``. Anything outside the
    backbone gets ``num_layers + 1`` (full lr).
    """
    import re

    if "backbone" not in path:
        return num_layers + 1
    if "stem" in path or "patch_embed" in path or "pos_embed" in path:
        return 0
    m = re.search(r"stage(\d+)_block(\d+)", path)
    if m:
        stage_id, block_id = int(m.group(1)), int(m.group(2))
        if stage_id == 0:
            return 1
        if stage_id == 1:
            return 2
        if stage_id == 2:
            return 3 + block_id // 3
        return num_layers
    m = re.search(r"down_(?:conv|norm)(\d+)", path)
    if m:
        stage_id = int(m.group(1))
        return {1: 2, 2: 3}.get(stage_id, num_layers)
    m = re.search(r"layers?_?(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return num_layers


def layer_decay_lr_mults(params, decay_rate: float, num_layers: int):
    """Per-param lr multiplier tree: decay_rate ** (num_layers + 1 - layer_id)."""

    def mult(path, _leaf):
        lid = layer_id_for_path(_path_str(path), num_layers)
        return decay_rate ** (num_layers + 1 - lid)

    return jax.tree_util.tree_map_with_path(mult, params)


def make_lr_schedule(cfg: OptimConfig):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(cfg.warmup_steps, 1), 0.0, 1.0)
        warm_mult = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * warm_frac
        prog = jnp.clip(step / cfg.total_steps, 0.0, 1.0)
        if cfg.schedule == "poly":
            main = (1.0 - prog) ** cfg.power
            lr = (cfg.lr - cfg.min_lr) * main + cfg.min_lr
        elif cfg.schedule == "cosine":
            lr = cfg.min_lr + 0.5 * (cfg.lr - cfg.min_lr) * (1.0 + jnp.cos(jnp.pi * prog))
        elif cfg.schedule == "constant":
            lr = jnp.asarray(cfg.lr)
        elif cfg.schedule == "cyclic":
            # one-cycle: lr -> lr*r_up over the up phase, then anneal
            # (cosine) to lr*r_down; no extra warmup (the up phase IS it)
            r_up, r_down = cfg.cyclic_target_ratio
            up = cfg.cyclic_step_ratio_up
            peak, floor = cfg.lr * r_up, cfg.lr * r_down
            up_frac = jnp.clip(prog / up, 0.0, 1.0)
            down_frac = jnp.clip((prog - up) / max(1.0 - up, 1e-8), 0.0, 1.0)
            lr_up = cfg.lr + (peak - cfg.lr) * 0.5 * (
                1.0 - jnp.cos(jnp.pi * up_frac))
            lr_down = floor + (peak - floor) * 0.5 * (
                1.0 + jnp.cos(jnp.pi * down_frac))
            lr = jnp.where(prog < up, lr_up, lr_down)
            return lr  # cyclic ignores the linear warmup multiplier
        else:
            raise ValueError(f"unknown schedule {cfg.schedule!r}")
        return lr * warm_mult

    return sched


def make_momentum_schedule(cfg: OptimConfig):
    """Cyclic b1 schedule, inverse-phased to the lr (mmcv
    CyclicMomentumUpdaterHook semantics: momentum dips while lr peaks)."""
    b1 = cfg.betas[0]
    r_down, r_up = cfg.cyclic_momentum_ratio  # e.g. (0.8947, 1.0)
    up = cfg.cyclic_step_ratio_up

    def sched(step):
        prog = jnp.clip(jnp.asarray(step, jnp.float32) / cfg.total_steps,
                        0.0, 1.0)
        low, high = b1 * r_down, b1 * r_up
        up_frac = jnp.clip(prog / up, 0.0, 1.0)
        down_frac = jnp.clip((prog - up) / max(1.0 - up, 1e-8), 0.0, 1.0)
        m_up = high + (low - high) * 0.5 * (1.0 - jnp.cos(jnp.pi * up_frac))
        m_down = high + (low - high) * 0.5 * (1.0 + jnp.cos(jnp.pi * down_frac))
        return jnp.where(prog < up, m_up, m_down)

    return sched


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    """Build the full update chain: clip → adamw(masked wd, per-group lr)."""
    rules = jax.tree_util.tree_map_with_path(
        lambda p, x: _rule_for(_path_str(p), x, cfg.custom_keys), params
    )
    decay_mask = jax.tree_util.tree_map(lambda r: r[1] > 0, rules,
                                        is_leaf=lambda x: isinstance(x, tuple))
    lr_mults = jax.tree_util.tree_map(lambda r: r[0], rules,
                                      is_leaf=lambda x: isinstance(x, tuple))
    if cfg.layer_decay_rate is not None:
        ld = layer_decay_lr_mults(params, cfg.layer_decay_rate,
                                  cfg.layer_decay_num_layers)
        lr_mults = jax.tree_util.tree_map(lambda m, d: m * d, lr_mults, ld)
    sched = make_lr_schedule(cfg)

    def scale_by_lr_mult() -> optax.GradientTransformation:
        def init(_):
            return optax.EmptyState()

        def update(updates, state, params=None):
            updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, lr_mults)
            return updates, state

        return optax.GradientTransformation(init, update)

    if cfg.schedule == "cyclic" and cfg.cyclic_momentum:
        m_sched = make_momentum_schedule(cfg)
        adamw = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate=learning_rate, b1=b1, b2=cfg.betas[1],
                eps=1e-8, weight_decay=cfg.weight_decay, mask=decay_mask)
        )(learning_rate=sched, b1=m_sched)
    else:
        adamw = optax.adamw(
            learning_rate=sched,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        adamw,
        scale_by_lr_mult(),
    )
