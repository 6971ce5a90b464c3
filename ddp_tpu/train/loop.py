"""The training loop — TPU-native IterBasedRunner equivalent.

Replaces the reference's runner+hooks pyramid (mmcv IterBasedRunner with
LrUpdater/Optimizer/Checkpoint/Eval/Logger hooks — SURVEY.md §1 layer 3) with
a flat loop around ONE jitted step: LR schedule and clipping live inside the
optax chain, checkpointing via orbax, logging/eval as host callbacks on an
interval. Deterministic seeding comes from a single folded PRNG key (the
reference's rank-0 seed broadcast is unnecessary — every host folds the same
key).
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from ..config import Config, build_model
from ..parallel.mesh import make_mesh, shard_batch
from .checkpoint import CheckpointManager
from .optim import make_optimizer
from .state import TrainState, make_train_step


class MetricLogger:
    """Text + JSONL + TensorBoard-events logger (TextLoggerHook +
    TensorboardLoggerHook equivalent — reference ddp_nyu/...py:147-153)."""

    def __init__(self, workdir: str, interval: int = 50,
                 tensorboard: bool = True):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "train_log.jsonl")
        self.interval = interval
        self._t0 = time.time()
        self._last_step = 0
        self.tb = None
        if tensorboard:
            from .events import TBEventWriter

            self.tb = TBEventWriter(os.path.join(workdir, "tf_logs"))

    def log(self, step: int, logs: Dict[str, float], lr: float):
        now = time.time()
        steps_per_s = (step - self._last_step) / max(now - self._t0, 1e-9)
        self._t0, self._last_step = now, step
        rec = {"step": step, "lr": lr, "steps_per_s": round(steps_per_s, 3)}
        rec.update({k: float(v) for k, v in logs.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.tb is not None:
            self.tb.add_scalars(step, {f"train/{k}": v for k, v in rec.items()
                                       if k != "step"})
        msg = " ".join(f"{k}={v:.4g}" for k, v in rec.items() if k != "step")
        print(f"[step {step}] {msg}", flush=True)

    def log_eval(self, step: int, metrics: Dict[str, float]):
        if self.tb is not None:
            self.tb.add_scalars(step, {
                f"val/{k}": float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))})


def train(
    cfg: Config,
    data_iter: Iterator[Dict[str, np.ndarray]],
    eval_fn: Optional[Callable[[TrainState, int], Dict[str, float]]] = None,
    mesh=None,
    resume: bool = False,
    init_params=None,
) -> TrainState:
    """Run cfg.runtime.total_iters steps. ``data_iter`` yields host batches
    {'image': [B,H,W,C], 'label': ...} with B = global batch size."""
    model = build_model(cfg.model)
    rt = cfg.runtime
    if mesh is None:
        if jax.process_count() > 1:
            # multi-host: the mesh MUST span every process's devices — the
            # shard_batch make_array_from_process_local_data path assembles
            # the global batch from per-process local shards.
            assert cfg.data.batch_size % len(jax.devices()) == 0, (
                f"global batch {cfg.data.batch_size} must divide over "
                f"{len(jax.devices())} devices on {jax.process_count()} hosts")
            mesh = make_mesh(devices=jax.devices())
        else:
            # largest device count that divides the global batch
            ndev = len(jax.devices())
            n_data = next(d for d in range(min(ndev, cfg.data.batch_size), 0, -1)
                          if cfg.data.batch_size % d == 0)
            mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
    if cfg.model.task == "controlnet":
        batch_keys = ("image", "hint", "ids")
    elif cfg.model.task == "bev":
        from ..data.bev_datasets import BEV_BATCH_KEYS as batch_keys
    elif cfg.model.task == "bev_fusion":
        from ..data.bev_datasets import FUSION_BATCH_KEYS as batch_keys
    else:
        batch_keys = ("image", "label")

    rng = jax.random.PRNGKey(rt.seed)
    init_rng, state_rng = jax.random.split(rng)

    batch0 = next(data_iter)
    if init_params is None:
        variables = model.init(
            {"params": init_rng, "diffusion": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            *[jax.tree_util.tree_map(lambda a: jax.numpy.asarray(a[:1]),
                                     batch0[k]) for k in batch_keys],
            train=False,
        )
    else:
        variables = init_params
    tx = make_optimizer(cfg.optim, variables["params"])
    state = TrainState.create(variables["params"], tx,
                              variables.get("batch_stats", {}), state_rng)

    ckpt = CheckpointManager(rt.workdir, rt.max_keep_ckpts,
                             save_best=rt.save_best or None,
                             best_mode=rt.save_best_mode)
    # checkpoint meta mirrors the reference's CLASSES/PALETTE embedding
    # (tools/train.py:221-232) so downstream tools can render predictions
    from ..data.seg_datasets import NUM_CLASSES, PALETTES

    ckpt_meta = {"config": cfg,
                 "num_classes": NUM_CLASSES.get(cfg.data.dataset,
                                                cfg.model.num_classes),
                 "palette": PALETTES.get(cfg.data.dataset)}
    start_step = 0
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        start_step = int(state.step)
        print(f"resumed from step {start_step}", flush=True)

    logger = MetricLogger(rt.workdir, rt.log_interval,
                          tensorboard=rt.tensorboard)
    from .optim import make_lr_schedule

    sched = make_lr_schedule(cfg.optim)

    def crossed(prev, now, interval):
        return now // interval > prev // interval or now == rt.total_iters

    def eval_ckpt_hooks(prev, now):
        if crossed(prev, now, rt.ckpt_interval):
            ckpt.save(now, jax.device_get(state), meta=ckpt_meta)
        if eval_fn is not None and crossed(prev, now, rt.eval_interval):
            metrics = eval_fn(state, now)
            logger.log_eval(now, metrics)
            if ckpt.save_best_if(now, jax.device_get(state), metrics,
                                 meta=ckpt_meta):
                print(f"[best @ {now}] {rt.save_best}="
                      f"{metrics.get(rt.save_best)}", flush=True)
            print(f"[eval @ {now}] " +
                  " ".join(f"{k}={v:.4f}" for k, v in metrics.items()
                           if isinstance(v, float)), flush=True)

    spd = max(1, rt.steps_per_dispatch)
    if spd > 1:
        # ckpt/eval hooks fire at chunk-end resolution: a crossing inside a
        # chunk lands at the chunk's final step (e.g. interval 500, spd 10 →
        # ckpt at 500; interval 503 → ckpt at 510). Warn on misalignment so
        # user-set intervals don't silently drift (ADVICE r2).
        for nm, iv in (("ckpt_interval", rt.ckpt_interval),
                       ("eval_interval", rt.eval_interval)):
            if iv % spd:
                print(f"[warn] runtime.{nm}={iv} is not a multiple of "
                      f"steps_per_dispatch={spd}; the hook fires at the "
                      f"chunk-end step after each crossing", flush=True)
        # multi-step dispatch: scan the raw step over stacked batch chunks
        # inside ONE program — per-dispatch host latency amortized spd×
        from ..parallel.mesh import shard_batch_chunk
        from .state import make_chunked_train_step

        chunk_fns = {spd: make_chunked_train_step(
            model, tx, spd, mesh=mesh, batch_keys=tuple(batch_keys),
            mixed_precision=rt.mixed_precision)}
        step = start_step
        pending = batch0
        while step < rt.total_iters:
            n = min(spd, rt.total_iters - step)
            if n not in chunk_fns:  # tail chunk: one extra (smaller) compile
                chunk_fns[n] = make_chunked_train_step(
                    model, tx, n, mesh=mesh, batch_keys=tuple(batch_keys),
                    mixed_precision=rt.mixed_precision)
            chunk = []
            for _ in range(n):
                chunk.append(pending if pending is not None
                             else next(data_iter))
                pending = None
            # tree-stack so nested batch entries (e.g. fusion rulebooks
            # dicts) stack leaf-wise instead of becoming object arrays
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *[{k: c[k] for k in batch_keys}
                                            for c in chunk])
            state, logs = chunk_fns[n](state, shard_batch_chunk(mesh, stacked))
            prev, step = step, step + n
            # honor EVERY log-interval crossing inside the chunk, plus the
            # very first step of a fresh run (ADVICE r2: the last-crossing-
            # only logic dropped intermediate crossings and the first-step
            # log when log_interval < steps_per_dispatch)
            crossings = [s for s in range(prev + 1, step + 1)
                         if s % rt.log_interval == 0]
            if prev == start_step and (prev + 1) not in crossings:
                crossings.insert(0, prev + 1)
            if crossings:
                logs_host = jax.device_get(logs)
                for at in crossings:
                    rec = {k: float(np.asarray(v)[at - prev - 1])
                           for k, v in logs_host.items()}
                    logger.log(at, rec, float(sched(at - 1)))
            eval_ckpt_hooks(prev, step)
        return state

    step_fn = make_train_step(model, tx, mesh=mesh, batch_keys=tuple(batch_keys),
                              mixed_precision=rt.mixed_precision)
    batch = batch0
    for step in range(start_step, rt.total_iters):
        state, logs = step_fn(state, shard_batch(mesh, batch))
        if (step + 1) % rt.log_interval == 0 or step == start_step:
            logger.log(step + 1, jax.device_get(logs), float(sched(step)))
        if (step + 1) % rt.ckpt_interval == 0 or (step + 1) == rt.total_iters:
            ckpt.save(step + 1, jax.device_get(state), meta=ckpt_meta)
        if eval_fn is not None and ((step + 1) % rt.eval_interval == 0
                                    or (step + 1) == rt.total_iters):
            metrics = eval_fn(state, step + 1)
            logger.log_eval(step + 1, metrics)
            if ckpt.save_best_if(step + 1, jax.device_get(state), metrics,
                                 meta=ckpt_meta):
                print(f"[best @ {step + 1}] {rt.save_best}="
                      f"{metrics.get(rt.save_best)}", flush=True)
            print(f"[eval @ {step + 1}] " +
                  " ".join(f"{k}={v:.4f}" for k, v in metrics.items()
                           if isinstance(v, float)), flush=True)
        if step + 1 < rt.total_iters:
            batch = next(data_iter)
    return state
