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
    schedule: str = "poly"  # 'poly' | 'cosine' | 'constant'
    total_steps: int = 160_000
    warmup_steps: int = 1500
    warmup_ratio: float = 1e-6
    power: float = 1.0
    min_lr: float = 0.0


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
        else:
            raise ValueError(f"unknown schedule {cfg.schedule!r}")
        return lr * warm_mult

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
    sched = make_lr_schedule(cfg)

    def scale_by_lr_mult() -> optax.GradientTransformation:
        def init(_):
            return optax.EmptyState()

        def update(updates, state, params=None):
            updates = jax.tree_util.tree_map(lambda u, m: u * m, updates, lr_mults)
            return updates, state

        return optax.GradientTransformation(init, update)

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=sched,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
        ),
        scale_by_lr_mult(),
    )
