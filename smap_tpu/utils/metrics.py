"""Scalar metric logging: JSONL always, TensorBoard when available.

Replaces the reference's rank-0 ``tensorboardX.SummaryWriter`` usage
(``exps/stage3_root2/train.py:62,87-104`` in zju3dv/SMAP) with a writer
that always produces machine-readable JSONL and mirrors to TensorBoard if
``tensorboardX`` (or torch's SummaryWriter) is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        for mod in ("tensorboardX", "torch.utils.tensorboard"):
            try:
                import importlib

                tb = importlib.import_module(mod)
                self._tb = tb.SummaryWriter(log_dir)
                break
            except Exception:
                continue

    def write_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), global_step=int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
