"""Misc utilities: seeding, parameter counting, ETA formatting, logging.

Re-implements ``situation3d/utils/{misc,eta,count_parameters,logger}.py`` and
the LAVIS ``SmoothedValue``/``MetricLogger`` (``lavis/common/logger.py:19-189``)
in mesh terms: cross-replica metric sync is a ``jax.device_get`` of an
already-psum'd value, so the window smoothing here is purely host-side.
"""
from __future__ import annotations

import datetime
import logging
import random
import sys
import time
from collections import defaultdict, deque
from typing import Any, Dict, Iterable, Optional

import numpy as np


def set_seed(seed: int) -> None:
    """Host-side seeding (train.py:419-425). Device randomness is explicit
    through jax.random keys, so nothing else is needed for determinism."""
    random.seed(seed)
    np.random.seed(seed)


def count_parameters(params) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def decode_eta(seconds: float) -> str:
    """h:mm:ss ETA string (utils/eta.py:19)."""
    return str(datetime.timedelta(seconds=int(seconds)))


class SmoothedValue:
    """Window-averaged scalar (lavis/common/logger.py:19-60)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg)


class MetricLogger:
    """Iteration logger with ETA (lavis MetricLogger.log_every)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", logger: Optional[logging.Logger] = None):
        log = (logger or logging.getLogger(__name__)).info
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        i = 0
        end = time.time()
        for obj in iterable:
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                eta = decode_eta(iter_time.global_avg * 1)  # open-ended iters
                log(f"{header} [{i}] eta-per-iter: {iter_time} {self}")
            i += 1
            end = time.time()
        log(f"{header} done in {decode_eta(time.time() - start)} ({i} iters)")


def setup_logger(name: str = "situation3d_tpu",
                 level: int = logging.INFO) -> logging.Logger:
    """Plain stream logger (lavis setup_logger / utils/logger.py analogue)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)
    return logger
