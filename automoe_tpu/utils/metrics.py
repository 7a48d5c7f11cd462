"""Structured metrics logging: JSONL always, TensorBoard when available.

Replaces the reference's rank-0 SummaryWriter + tqdm postfix pattern
(train_bdd100k_ddp.py:60-63,104-110) with a process-0-guarded logger that
writes machine-readable JSONL next to the TB events.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.enabled = jax.process_index() == 0
        self.run_dir = Path(run_dir)
        self._tb = None
        self._fh = None
        if not self.enabled:
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.run_dir / "metrics.jsonl", "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        if not self.enabled:
            return
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v)
            for k, v in metrics.items()
            if isinstance(v, (int, float)) or getattr(v, "ndim", 1) == 0
        }
        rec = {"step": int(step), "time": time.time(), **flat}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, int(step))

    def heartbeat(self) -> None:
        """Freshen metrics.jsonl's mtime WITHOUT writing a record — the
        supervisor's hang detector watches this file, and long validation
        or checkpoint phases would otherwise look like a hung trainer
        (tools/supervisor.py --heartbeat)."""
        if not self.enabled:
            return
        import os

        try:
            os.utime(self.run_dir / "metrics.jsonl")
        except OSError:
            pass

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._tb:
            self._tb.close()
