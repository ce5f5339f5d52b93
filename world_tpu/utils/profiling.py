"""Observability: xRT counters and device trace capture.

The reference has no tracing/profiling beyond a timeit call
(/root/reference/test/speed.py:18).  This module provides the framework's
equivalents: a wall-clock xRT (audio-seconds per second) meter with
block-until-ready semantics, and a jax.profiler trace context for TensorBoard
/ Perfetto inspection of the on-device schedule.
"""
import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class XrtMeter:
    """Accumulates wall time + audio time across pipeline calls."""
    wall_seconds: float = 0.0
    audio_seconds: float = 0.0
    calls: int = 0
    per_stage: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def measure(self, audio_seconds: float, stage: str = "total"):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.wall_seconds += dt
        self.audio_seconds += audio_seconds
        self.calls += 1
        self.per_stage[stage] = self.per_stage.get(stage, 0.0) + dt

    @property
    def xrt(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def report(self) -> str:
        lines = [f"xRT {self.xrt:.1f} (audio {self.audio_seconds:.2f}s / "
                 f"wall {self.wall_seconds:.3f}s, {self.calls} calls)"]
        for k, v in sorted(self.per_stage.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:24s} {v*1000:9.2f} ms")
        return "\n".join(lines)


def timed(fn, *args, repeats: int = 3):
    """Median wall time of a device computation, compile excluded."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
