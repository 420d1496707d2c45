"""Metric writers: stdout, TensorBoard, wandb.

Replaces the reference's logging fan-out — wandb init/watch/log
(``train.py:284-291``, ``solver.py:426-474``), tensorboardX train/val
SummaryWriter pair (``solver.py:216-221``) and the text log — behind one
``MetricWriter`` facade. Optional backends degrade silently when their
packages are absent (hermetic environments).

Profiling: ``profiler_window`` wraps a step range in a ``jax.profiler``
trace (the TPU-native replacement for the reference's hand-rolled
fetch/forward/backward wall-clock timers, which the Trainer still reports
as ``time/*`` metrics for continuity).
"""
from __future__ import annotations

import collections
import contextlib
import datetime
import json
import logging
import os
import time
from typing import Dict, Iterable, Optional, Tuple


class MetricWriter:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 use_tensorboard: bool = False, project: str = "situation3d_tpu",
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._logger = logging.getLogger("situation3d_tpu.metrics")
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception:
                self._logger.warning("wandb unavailable; skipping")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._logger.warning("tensorboard unavailable; skipping")

    def write(self, metrics: Dict[str, float], step: int,
              prefix: str = "") -> None:
        flat = {f"{prefix}{k}": float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))}
        self._jsonl.write(json.dumps({"step": step, **flat}) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def write_image(self, tag: str, img, step: int) -> None:
        """Log a rendered image (uint8 HWC) into the metric stream — the
        analogue of the reference's wandb image logging
        (``situation3d/utils/visualization.py:77-244``). Always lands as a
        PNG file under ``log_dir/images/``; additionally forwarded to
        wandb / tensorboard when configured."""
        import numpy as np

        from situation3d_tpu.eval.visualization import write_png

        img = np.asarray(img, np.uint8)
        d = os.path.join(os.path.dirname(self._jsonl.name), "images")
        os.makedirs(d, exist_ok=True)
        write_png(os.path.join(d, f"{tag.replace('/', '_')}_{step}.png"), img)
        if self._wandb is not None:
            self._wandb.log({tag: self._wandb.Image(img)}, step=step)
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


class SmoothedValue:
    """Windowed metric smoothing (``lavis/common/logger.py:19-78``): tracks
    a deque of the last ``window_size`` values plus global totals; exposes
    median/avg over the window, global_avg, max and the latest value. The
    reference's ``synchronize_between_processes`` all_reduce of the global
    (count, total) becomes a host-side ``process_allgather`` sum."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self) -> None:
        import jax
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils
        import numpy as np
        both = multihost_utils.process_allgather(
            np.asarray([self.count, self.total], np.float64))
        self.count = int(both[:, 0].sum())
        self.total = float(both[:, 1].sum())

    @property
    def median(self) -> float:
        s = sorted(self.deque)
        return s[len(s) // 2] if s else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """``lavis/common/logger.py:81-175`` analogue: named SmoothedValues +
    ``log_every`` iterator printing iter/data time and ETA (the CUDA
    max-memory column is dropped; device memory is in the xprof trace)."""

    def __init__(self, delimiter: str = "  ", window_size: int = 20):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(
            lambda: SmoothedValue(window_size))
        self.delimiter = delimiter
        self._logger = logging.getLogger("situation3d_tpu.metrics")

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name: str):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def synchronize_between_processes(self) -> None:
        for m in self.meters.values():
            m.synchronize_between_processes()

    def global_avg(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterable:
        i = 0
        total = len(iterable) if hasattr(iterable, "__len__") else None
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        start = time.time()
        end = start
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = str(datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i))))
                    self._logger.info(
                        "%s [%d/%d] eta: %s %s time: %s data: %s", header, i,
                        total, eta, self, iter_time, data_time)
                else:
                    self._logger.info("%s [%d] %s time: %s data: %s",
                                      header, i, self, iter_time, data_time)
            i += 1
            end = time.time()
        self._logger.info("%s Total time: %s", header, str(
            datetime.timedelta(seconds=int(time.time() - start))))


@contextlib.contextmanager
def profiler_window(log_dir: str, enabled: bool):
    """jax.profiler trace context (chrome://tracing / xprof readable)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Starts/stops a jax.profiler trace over cfg.log.profile_steps."""

    def __init__(self, log_dir: str, window: Tuple[int, int]):
        self.log_dir = log_dir
        self.start, self.stop = window
        self._active = False

    def maybe_toggle(self, step: int) -> None:
        if self.stop <= self.start:
            return
        import jax
        if not self._active and step == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
