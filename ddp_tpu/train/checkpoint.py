"""Checkpoint save/restore via orbax.

Parity target: mmcv CheckpointHook semantics — periodic save with
``max_keep_ckpts`` pruning, ``--resume-from`` / auto-resume via latest-step
discovery, checkpoint metadata carrying the config (SURVEY.md §5;
reference tools/train.py:221-232, mmseg/apis/train.py:186-193).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, workdir: str, max_keep: int = -1,
                 save_best: Optional[str] = None, best_mode: str = "max"):
        """``save_best``: metric key tracked for best-checkpoint keeping
        (mmcv `save_best='mIoU'` with rule — reference configs/ade/...py:137,
        ddp_nyu/...py:137-144 `save_best='abs_rel', rule='less'`).
        ``best_mode``: 'max' (mIoU) or 'min' (abs_rel)."""
        self.dir = os.path.abspath(os.path.join(workdir, "ckpts"))
        os.makedirs(self.dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if max_keep is None or max_keep < 0 else max_keep,
            create=True,
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)
        self.best_key = save_best
        self.best_mgr = None
        if save_best:
            bdir = os.path.abspath(os.path.join(workdir, "ckpts_best"))
            self.best_mgr = ocp.CheckpointManager(
                bdir,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True,
                    best_fn=lambda m: float(m[save_best]),
                    best_mode=best_mode,
                ),
            )

    def save(self, step: int, state: Any, meta: Optional[dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if meta is not None:
            args["meta"] = ocp.args.JsonSave(_jsonable(meta))
        self.mgr.save(step, args=ocp.args.Composite(**args))
        self.mgr.wait_until_finished()

    def save_best_if(self, step: int, state: Any, metrics: dict,
                     meta: Optional[dict] = None):
        """Track the best checkpoint by the configured metric. No-op when
        save_best is unset or the metric is absent from ``metrics``."""
        if self.best_mgr is None or self.best_key not in metrics:
            return False
        args = {"state": ocp.args.StandardSave(state)}
        if meta is not None:
            args["meta"] = ocp.args.JsonSave(_jsonable(meta))
        saved = self.best_mgr.save(
            step, args=ocp.args.Composite(**args),
            metrics={self.best_key: float(metrics[self.best_key])})
        self.best_mgr.wait_until_finished()
        return bool(saved)

    def best_step(self) -> Optional[int]:
        return None if self.best_mgr is None else self.best_mgr.best_step()

    def restore_best(self, state_template: Any) -> Any:
        step = self.best_step()
        if step is None:
            raise FileNotFoundError("no best checkpoint recorded")
        restored = self.best_mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template))
        )
        return restored["state"]

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        restored = self.mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template))
        )
        return restored["state"]


def _jsonable(obj):
    if dataclasses.is_dataclass(obj):
        return _jsonable(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
