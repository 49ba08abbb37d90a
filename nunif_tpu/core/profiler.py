"""Profiling / tracing hooks.

TPU-native replacement for the reference's ad-hoc tqdm timing + peak-VRAM
reports (SURVEY.md §5.1): jax.profiler trace capture (viewable in
TensorBoard / Perfetto), named trace annotations for pipeline stages, and
a lightweight stage timer for host-side reporting.
"""
from __future__ import annotations

import contextlib
import time

import jax

from .logger import logger


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with trace('/tmp/jaxtrace'): run()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region visible in the device trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Host-side cumulative per-stage wall-clock timing.

    timer = StageTimer()
    with timer("decode"): ...
    with timer("depth"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {n} calls, "
                         f"{total / n * 1000:.1f}ms avg")
        return "\n".join(lines)


def device_memory_stats():
    """Peak/in-use HBM per device (the reference's peak-VRAM report)."""
    stats = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
        except Exception:
            s = {}
        stats.append({
            "device": str(d),
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        })
    return stats
