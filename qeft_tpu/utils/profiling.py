"""Tracing / profiling / phase timing.

The reference has no systematic tracing (NVTX ranges commented out,
qlinear.py:5; manual perf_counter+synchronize, main.py:344-351).  Here it's
first-class: phase timers with a queryable registry, and a context manager
around `jax.profiler` for device traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class Telemetry:
    """Process-wide phase timing registry."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def record(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / max(self.counts[name], 1), 6),
            }
            for name in sorted(self.totals)
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=1)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


GLOBAL = Telemetry()


@contextlib.contextmanager
def phase_timer(name: str, telemetry: Optional[Telemetry] = None, sync=None):
    """Time a phase; ``sync`` is an optional array/fn forced before stopping
    the clock (e.g. lambda: x.block_until_ready())."""
    t = telemetry or GLOBAL
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            sync() if callable(sync) else None
        t.record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Device-level trace via jax.profiler (open in TensorBoard/Perfetto)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
