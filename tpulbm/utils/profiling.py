"""Profiling and throughput instrumentation.

The reference has no self-measurement at all (SURVEY §5: no timers, never
reports its own MLUPS). Here: a jax.profiler trace context and a simple
MLUPS meter used by the runner and bench.py.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace (view in TensorBoard / xprof); no-op if dir None."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class ThroughputMeter:
    """Accumulates (cells × steps) / wall-seconds → MLUPS
    (million lattice-site updates per second — the BASELINE.json metric)."""

    def __init__(self, num_cells: int):
        self.num_cells = num_cells
        self.steps = 0
        self.seconds = 0.0

    @contextlib.contextmanager
    def measure(self, n_steps: int):
        t0 = time.perf_counter()
        yield
        self.seconds += time.perf_counter() - t0
        self.steps += n_steps

    @property
    def mlups(self) -> float:
        if self.seconds == 0:
            return 0.0
        return self.num_cells * self.steps / self.seconds / 1e6
