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


def trace_device_span_s(trace_dir: str) -> float:
    """Total busy span (first event start -> last event end, seconds) of the
    busiest TPU trace line in a jax.profiler xplane capture.

    This is the project's device-trace A/B discipline (CLAUDE.md "Relay
    slope drift") packaged for bench.py: wall-clock two-point slopes drift
    ±0.1 ms with the axon relay's mood, but the device span of a fixed
    compiled program is stable, so trace-derived MFU can't be masked (or
    faked) by relay jitter. Returns -1.0 if no TPU plane is found or the
    xplane proto is unavailable.
    """
    import glob

    try:
        try:
            from xprof.protobuf import xplane_pb2
        except ImportError:
            from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        return -1.0

    best_ps = -1.0
    for path in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if not line.events:
                    continue
                s0 = min(ev.offset_ps for ev in line.events)
                s1 = max(ev.offset_ps + ev.duration_ps for ev in line.events)
                best_ps = max(best_ps, float(s1 - s0))
    return best_ps / 1e12 if best_ps > 0 else -1.0


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
