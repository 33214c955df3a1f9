"""Profiling / tracing harness.

Replaces the reference's always-on wall-clock prints + CUDA memory dumps in
the renderer forward (reference: src/models/renderer.py:74-199) with
structured, opt-in instrumentation:

  * `timed()` — block_until_ready wall-clock timing for jitted fns;
  * `trace()` — jax.profiler trace context writing TensorBoard-viewable
    traces (the torch.profiler/NVTX analog);
  * `annotate()` — named sub-scopes inside traced regions
    (jax.profiler.TraceAnnotation);
  * `device_memory_stats()` — the torch.cuda.memory_allocated analog.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kw):
    """Returns (mean_seconds, last_output) with block_until_ready fencing."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args, **kw))
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace -> view in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
        "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / 1e6,
    }


class StageTimer:
    """Accumulating named-stage timer for host-side loops."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1e3:.1f}ms"
            for k in self.totals)
