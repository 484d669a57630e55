"""Metrics + logging: rank0 python logger, TensorBoard scalars, cross-host
loss reduction.

Equivalent of the reference's observability (SURVEY.md §5): rank0-only
logger writing log.txt (imagenet_gen/src/utils.py:8-26), TensorBoard
train/{loss,lr,steps_per_sec,grad_norm} scalars with losses all-reduced
across ranks before logging (train.py:168-201, 333).
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import numpy as np


def create_logger(log_dir: str | None = None) -> logging.Logger:
    """Rank0 logger with file + stream handlers (src/utils.py:8-26)."""
    logger = logging.getLogger("bitdance_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s] %(message)s", "%Y-%m-%d %H:%M:%S")
    if jax.process_index() == 0:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


class ScalarWriter:
    """TensorBoard-compatible scalar writer; falls back to JSONL when
    tensorboard isn't importable."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._tb = None
        if jax.process_index() != 0:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except ImportError:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if jax.process_index() != 0:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "time": time.time()}) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()


class MetricAccumulator:
    """Running means over a logging window (train.py:160-201's running dict).

    In SPMD, jitted metrics are already global (GSPMD reduces them), so no
    explicit all-reduce is needed — the NCCL all_reduce disappears.
    """

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.count = 0
        self.t0 = time.time()

    def update(self, **metrics) -> None:
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(np.asarray(v))
        self.count += 1

    def flush(self) -> tuple[dict, float]:
        steps_per_sec = self.count / max(time.time() - self.t0, 1e-9)
        means = {k: v / max(self.count, 1) for k, v in self.sums.items()}
        self.sums, self.count, self.t0 = {}, 0, time.time()
        return means, steps_per_sec
