"""Profiling and step-timing helpers.

The reference's only observability is coarse wall-clock epoch timing
(reference train.py:381-410) pushed to wandb. TPU-native equivalents:

- ``trace(logdir)``: ``jax.profiler`` trace capture for TensorBoard /
  Perfetto, covering XLA ops, Pallas kernels and host callbacks;
- ``StepTimer``: throughput-oriented step timing that reports
  images/sec(/chip) — the BASELINE.json headline metric — with a dependent
  device→host fetch as the synchronization barrier (``block_until_ready``
  alone is not a reliable fence on remote-tunnel platforms; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(x) -> None:
    """Reliable device sync: host-fetch a scalar reduction of ``x``."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


class StepTimer:
    """Rolling step timer: ``with timer.step(n_items): run_step()``."""

    def __init__(self, window: int = 50):
        self.window = window
        self.durations: List[float] = []
        self.items: List[int] = []

    @contextlib.contextmanager
    def step(self, n_items: int = 1, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            fence(sync)
        self.durations.append(time.perf_counter() - t0)
        self.items.append(n_items)
        if len(self.durations) > self.window:
            self.durations.pop(0)
            self.items.pop(0)

    @property
    def items_per_sec(self) -> float:
        total = sum(self.durations)
        return sum(self.items) / total if total > 0 else 0.0

    @property
    def mean_step_seconds(self) -> float:
        return sum(self.durations) / len(self.durations) if self.durations else 0.0

    def per_chip(self, n_chips: Optional[int] = None) -> float:
        n = n_chips or jax.device_count()
        return self.items_per_sec / max(1, n)

    def summary(self) -> Dict[str, float]:
        return {
            "items_per_sec": self.items_per_sec,
            "items_per_sec_per_chip": self.per_chip(),
            "mean_step_seconds": self.mean_step_seconds,
        }
