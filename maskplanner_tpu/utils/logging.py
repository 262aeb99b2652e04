"""Run logging: wandb-compatible facade over a local JSONL sink.

The reference logs to wandb (train_maskplanner.py:85-95, :229-237). This
environment has no wandb package/network; ``Run`` exposes the same calls
(``log``, ``summary``, ``finish``) writing JSONL + a summary.json in the
run dir, and transparently mirrors to wandb when importable and enabled.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


class Run:
    def __init__(self, run_dir: str, config: Mapping | None = None,
                 project: str = "MaskPlanner", group: str | None = None,
                 name: str | None = None, mode: str = "disabled"):
        self.run_dir = run_dir
        self.summary: dict[str, Any] = {}
        os.makedirs(run_dir, exist_ok=True)
        self._log_path = os.path.join(run_dir, "logs.jsonl")
        self._fh = open(self._log_path, "a", encoding="utf-8")
        self._wandb = None
        if mode not in ("disabled", "offline-local"):
            try:
                import wandb

                self._wandb = wandb.init(project=project, group=group,
                                         name=name, mode=mode,
                                         config=dict(config or {}))
            except Exception:
                self._wandb = None

    def log(self, data: Mapping[str, Any], step: int | None = None):
        rec = {"_time": time.time(), **{k: _tofloat(v) for k, v in data.items()}}
        if step is not None:
            rec["_step"] = step
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(dict(data), step=step)

    def finish(self):
        with open(os.path.join(self.run_dir, "summary.json"), "w") as f:
            json.dump({k: _tofloat(v) for k, v in self.summary.items()}, f,
                      indent=2)
        self._fh.close()
        if self._wandb is not None:
            for k, v in self.summary.items():
                self._wandb.summary[k] = v
            self._wandb.finish()


def _tofloat(v):
    try:
        import numpy as np

        if isinstance(v, (np.generic,)):
            return v.item()
    except Exception:
        pass
    if hasattr(v, "item") and not isinstance(v, (str, bytes)):
        try:
            return v.item()
        except Exception:
            return v
    return v
