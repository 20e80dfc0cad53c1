"""Profiling: device traces + phase statistics.

The reference's observability is RAII phase timers printed at INFO
(minigpt4.cpp:287-312) plus memory high-water marks; the TPU-native
equivalents are ``jax.profiler`` traces (viewable in XProf/TensorBoard) and
the throughput counters the benchmark reports.

Usage::

    from minigpt4_tpu.profiling import trace, DecodeStats

    with trace("/tmp/minigpt4_trace"):
        engine.encode_image(px)

    stats = DecodeStats()
    for tok in engine.generate(params=sp):
        stats.tick()
    print(stats.summary())
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np


@contextmanager
def trace(log_dir: str):
    """Capture a device trace (open with XProf / TensorBoard profile tab)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """HBM usage for the addressable device (the reference prints compute /
    scratch buffer high-water marks after each encode; this is the analogue)."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


class DecodeStats:
    """Streaming decode throughput: call :meth:`tick` per token."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.times: list[float] = []

    def tick(self) -> None:
        self.times.append(time.perf_counter())

    def summary(self) -> dict:
        if not self.times:
            return {"tokens": 0}
        total = self.times[-1] - self.t0
        gaps = np.diff([self.t0] + self.times)
        return {
            "tokens": len(self.times),
            "tok_s": len(self.times) / total if total > 0 else float("inf"),
            "ttft_ms": (self.times[0] - self.t0) * 1e3,
            "p50_ms": float(np.median(gaps) * 1e3),
            "p99_ms": float(np.percentile(gaps, 99) * 1e3),
        }
