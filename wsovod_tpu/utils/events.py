"""Event storage + writers (d2 EventStorage / CommonMetricPrinter /
JSONWriter / TensorboardXWriter equivalents; reference
``wsovod/engine/defaults.py:47-64`` and SURVEY.md §5 observability)."""

from __future__ import annotations

import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class EventStorage:
    def __init__(self, start_iter: int = 0):
        self.iter = start_iter
        self._history = defaultdict(list)  # name -> [(iter, value)]
        self._latest: Dict[str, float] = {}

    def put_scalar(self, name: str, value):
        value = float(value)
        self._history[name].append((self.iter, value))
        self._latest[name] = value

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> Dict[str, float]:
        return dict(self._latest)

    def median(self, name: str, window: int = 20) -> float:
        vals = [v for _, v in self._history[name][-window:]]
        vals = sorted(vals)
        return vals[len(vals) // 2] if vals else float("nan")

    def step(self):
        self.iter += 1


class JSONWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, storage: EventStorage):
        rec = {"iteration": storage.iter, **storage.latest()}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


class TensorboardWriter:
    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter

        self._w = SummaryWriter(log_dir)

    def write(self, storage: EventStorage):
        for k, v in storage.latest().items():
            self._w.add_scalar(k, v, storage.iter)

    def close(self):
        self._w.close()


class CommonMetricPrinter:
    def __init__(self, max_iter: Optional[int] = None):
        self.max_iter = max_iter
        self._last_time = time.perf_counter()
        self._last_iter = None

    def write(self, storage: EventStorage):
        now = time.perf_counter()
        it = storage.iter
        rate = ""
        if self._last_iter is not None and it > self._last_iter:
            sec_per_iter = (now - self._last_time) / (it - self._last_iter)
            rate = f" {sec_per_iter:.3f}s/it"
            if self.max_iter:
                eta = sec_per_iter * (self.max_iter - it)
                rate += f" eta {eta / 3600:.1f}h"
        self._last_time = now
        self._last_iter = it
        losses = "  ".join(
            f"{k}: {v:.4g}" for k, v in sorted(storage.latest().items()) if "loss" in k
        )
        logger.info("iter %d  %s%s", it, losses, rate)

    def close(self):
        pass
