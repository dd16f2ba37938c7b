"""Profiling and observability.

The reference's only instrumentation is wall-clock printf timing around the
BVH build and (commented) per-frame counters (SURVEY.md §5).  Here timing is
a first-class utility: scoped wall-clock timers with a global registry, ray
throughput accounting for renders, and a hook into jax.profiler for XLA
traces on TPU.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class Timings:
    """Registry of named wall-clock sections."""

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [
            f"{name:30s} {self.totals[name]*1e3:9.2f} ms  x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)

    def as_json(self) -> str:
        return json.dumps(
            {k: {"total_s": self.totals[k], "count": self.counts[k]}
             for k in self.totals}
        )


GLOBAL_TIMINGS = Timings()


def rays_per_sample(max_depth: int) -> int:
    """Traced rays per pixel-sample at depth D: 1 camera + (D-2) extension
    closest-hits and 2*(D-1) any-hits (see models/integrator.py)."""
    return 1 + max(max_depth - 2, 0) + 2 * max(max_depth - 1, 0)


@dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    max_depth: int
    seconds: float

    @property
    def total_rays(self) -> int:
        return self.width * self.height * self.spp * rays_per_sample(self.max_depth)

    @property
    def mrays_per_s(self) -> float:
        return self.total_rays / max(self.seconds, 1e-9) / 1e6

    def __str__(self):
        return (
            f"{self.width}x{self.height} {self.spp}spp depth{self.max_depth}: "
            f"{self.seconds:.3f}s  {self.mrays_per_s:.1f} Mrays/s"
        )


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
