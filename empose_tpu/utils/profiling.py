"""Profiling helpers: jax.profiler traces + lightweight step timing.

The reference's only observability is wall-clock prints (reference:
train.py:136-159); this adds XLA-level tracing for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def timeit_ms(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean wall-clock ms per call of ``fn(*args)``, device-synced.

    One untimed call to trigger compilation, ``warmup`` warm calls, then
    ``iters`` timed calls bracketed by ``block_until_ready``.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


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
