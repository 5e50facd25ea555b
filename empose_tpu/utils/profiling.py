"""Profiling helpers: jax.profiler traces + lightweight step timing.

The reference's only observability is wall-clock prints (reference:
train.py:136-159); this adds XLA-level tracing for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Timings:
    """EMA step timings keyed by phase name."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, name: str, block_on=None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - start
        self.ema[name] = dt if name not in self.ema else (
            self.decay * self.ema[name] + (1 - self.decay) * dt)

    def summary(self) -> str:
        return " ".join(f"{k}: {v * 1000:.2f}ms" for k, v in self.ema.items())
