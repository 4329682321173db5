"""Metrics logging + step timing + jax.profiler hooks.

Replaces Lightning's TensorBoardLogger/LearningRateMonitor (reference
``configs/config_gan.yaml:4-21``) with a dependency-light scalar logger:
JSONL metrics on disk (+TensorBoard event files when tensorboardX or tf is
importable), per-step wall-clock timing, and optional ``jax.profiler``
traces around chosen steps (SURVEY.md §5: the reference has no
tracing/profiling at all).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            row[key] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(key, float(v), int(step))
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Rolling steps/sec over the last ≤window ticks (updates every tick)."""

    def __init__(self, window: int = 50):
        from collections import deque

        self._ticks = deque([time.perf_counter()], maxlen=window + 1)
        self.steps_per_sec = 0.0

    def tick(self) -> None:
        self._ticks.append(time.perf_counter())
        span = self._ticks[-1] - self._ticks[0]
        if span > 0:
            self.steps_per_sec = (len(self._ticks) - 1) / span


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+n)."""

    def __init__(self, trace_dir: Optional[str], start_step: int = 10, n_steps: int = 3):
        self.trace_dir = trace_dir
        self.start = start_step
        self.stop = start_step + n_steps
        self._active = False

    def before_step(self, step: int) -> None:
        if self.trace_dir and step == self.start:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True

    def after_step(self, step: int) -> None:
        if self._active and step + 1 >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
