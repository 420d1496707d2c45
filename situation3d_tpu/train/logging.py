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

import contextlib
import json
import logging
import os
from typing import Dict, Optional, Tuple


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

    def close(self) -> None:
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()


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
