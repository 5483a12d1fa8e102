"""Profiling and numerical-debug instrumentation.

The reference has NO tracing/profiling beyond wall-clock prints
(models/render_class.py:211-220) and always-on autograd anomaly detection
(models/model.py:4) — SURVEY.md section 5 marks this as a gap to fill, not
port. Here:

- `trace(...)`: context manager around `jax.profiler` emitting a
  TensorBoard-loadable trace of device execution.
- `annotate(...)`: named TraceAnnotation for host-side phases.
- `enable_nan_checks()`: opt-in `jax_debug_nans` (the JAX-native analog of
  torch's anomaly detection — off by default; the reference pays the
  always-on cost).
- `StepTimer`: steady-state steps/sec with warmup exclusion.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.t0 = None

    def tick(self) -> None:
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self.t0 is None or self.count <= self.warmup:
            return float("nan")
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)
