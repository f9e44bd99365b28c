"""Structured metrics logging.

Replaces the reference's scattered logging (wandb in training
`train.py:18`, loguru in C-score `C_score/utils/logger.py:13-21`, raw prints
everywhere) with one JSONL metrics logger + rank-0 gating. The JSONL schema
(step, timestamp, metrics...) is wandb-importable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

import jax


def rank0_print(*args, **kwargs):
    """Print only on process 0 (`train.py:46-48 rank0_print`)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, run_name: str = "run",
                 stdout: bool = True, every: int = 1):
        self.stdout = stdout
        self.every = every
        self._fh = None
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            path = os.path.join(log_dir, f"{run_name}.jsonl")
            self._fh = open(path, "a")
        self._t0 = time.time()
        self._last_step = 0
        self._last_t = self._t0
        # optional wandb mirror (the reference trains under
        # WANDB_PROJECT=diffllava_tuning, `train.py:18`): enabled only when
        # the env var is set AND wandb is importable; never required.
        self._wandb = None
        if os.getenv("WANDB_PROJECT") and jax.process_index() == 0:
            try:
                import wandb
                self._wandb = wandb.init(
                    project=os.environ["WANDB_PROJECT"], name=run_name,
                    dir=log_dir or ".", resume="allow")
            except Exception:  # noqa: BLE001 — offline/no wandb: degrade
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, Any]):
        if step % self.every:
            return
        now = time.time()
        rec = {"step": int(step), "time": round(now - self._t0, 3)}
        if step > self._last_step and now > self._last_t:
            rec["steps_per_sec"] = round(
                (step - self._last_step) / (now - self._last_t), 4)
        self._last_step, self._last_t = step, now
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items()
                             if k != "step"}, step=rec["step"])
        if self.stdout and jax.process_index() == 0:
            kv = " ".join(f"{k}={v:.5g}" if isinstance(v, float)
                          else f"{k}={v}" for k, v in rec.items()
                          if k != "time")
            print(f"[{rec['time']:9.1f}s] {kv}", file=sys.stderr)

    def close(self):
        if self._fh is not None:
            self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
