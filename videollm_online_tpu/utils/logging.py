"""Metric logging: JSONL always; TensorBoard events when available.

The reference reports to TensorBoard via HF Trainer (scripts/*:
--report_to tensorboard --logging_steps 10); here a small logger writes
both a greppable metrics.jsonl and TB summaries (flax/tensorboardX if
present), plus stdout."""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._tb = None
        try:
            from flax.metrics import tensorboard
            self._tb = tensorboard.SummaryWriter(
                os.path.join(output_dir, "tb"))
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Dict[str, float]):
        rec = {"step": step, "time": time.time(), **metrics}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        print(f"[step {step}] " + " ".join(
            f"{k}={v:.5g}" if isinstance(v, (int, float)) else f"{k}={v}"
            for k, v in metrics.items()))

    def log_dict(self, prefix: str, metrics: Dict[str, float],
                 step: int = 0):
        self.log(step, {f"{prefix}/{k}": v for k, v in metrics.items()})
