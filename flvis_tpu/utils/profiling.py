"""Per-stage timing and device tracing.

The reference's only instrumentation is wall-clock tic_toc_ros stopwatches
(/root/reference/src/utils/include/tic_toc_ros.h:13-36) and the per-frame
solving-time overlay (f2f_tracking.cpp:65,397-399).  Here: a stage timer
that forces device completion so stage boundaries are honest under async
dispatch, plus a thin wrapper over jax.profiler for full XLA traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-time per named stage; block_until_ready at each
    boundary makes the split meaningful despite JAX's async dispatch
    (which normally attributes all device time to the first sync point)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        box = {}
        yield box
        if self.sync and box.get("out") is not None:
            jax.block_until_ready(box["out"])
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def record(self, name: str, out):
        """Convenience: time the completion of `out` from now."""
        t0 = time.perf_counter()
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            tot = self.totals[name]
            n = max(self.counts[name], 1)
            lines.append(f"{name:28s} {1e3 * tot / n:8.2f} ms/call ×{n}  ({tot:.2f} s total)")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA/device trace viewable in TensorBoard/Perfetto (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
