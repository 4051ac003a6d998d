"""Process-global logger + lightweight metrics writer.

Extends the reference's bare global logger (``utils/logger.py:1-13``) with a
JSONL metrics sink (TensorBoard-free observability; `SummaryWriter` is used
when available) and per-phase wall-clock timers for profiling.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from contextlib import contextmanager
from typing import Dict, Optional

_logger: Optional[logging.Logger] = None
graph = None
dry_run = False


def get_logger(name: str = "rgbmanip_tpu") -> logging.Logger:
    global _logger
    if _logger is None:
        log = logging.getLogger(name)
        if not log.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(logging.Formatter("[%(asctime)s][%(levelname)s] %(message)s"))
            log.addHandler(h)
        log.setLevel(os.environ.get("RGBMANIP_LOGLEVEL", "INFO"))
        _logger = log
    return _logger


class MetricsWriter:
    """Append-only JSONL metrics + optional TensorBoard mirror."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # optional

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        self._fh.write(json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(prefix + k, v, step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


class PhaseTimer:
    """Accumulating per-phase wall-clock timers (sim / render / nn / update)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
