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
    def __init__(self, workdir: str, max_keep: int = -1):
        self.dir = os.path.abspath(os.path.join(workdir, "ckpts"))
        os.makedirs(self.dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=None if max_keep is None or max_keep < 0 else max_keep,
            create=True,
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

    def save(self, step: int, state: Any, meta: Optional[dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if meta is not None:
            args["meta"] = ocp.args.JsonSave(_jsonable(meta))
        self.mgr.save(step, args=ocp.args.Composite(**args))
        self.mgr.wait_until_finished()

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
