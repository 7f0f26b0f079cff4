"""Profiling helpers.

The reference's only instrumentation is wall-clock ``time.time()`` pairs
around forwards (modeling_utils.py:741-788). TPU equivalents: a device-trace
context (viewable in TensorBoard / Perfetto) and a step timer that reports
units/sec/chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates device-synchronized step timings."""

    def __init__(self):
        self.total = 0.0
        self.units = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result, units: int = 1):
        jax.block_until_ready(result)
        self.total += time.perf_counter() - self._t0
        self.units += units

    @property
    def units_per_sec(self) -> float:
        return self.units / self.total if self.total else 0.0

    @property
    def ms_per_unit(self) -> float:
        return self.total / self.units * 1e3 if self.units else 0.0
