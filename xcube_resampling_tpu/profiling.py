"""Tracing & profiling utilities.

The reference has no tracing/profiling at all (SURVEY.md §5: only %%time
cells in notebooks).  This module adds the rebuild's observability story:

* :class:`PhaseTimer` — lightweight per-phase wall-time counters with a
  summary report (host-side orchestration phases: CF inference, bbox scans,
  coordinate transforms, kernel launches).
* :func:`trace` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable device trace for the jitted kernels.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host
  phases show up in the device timeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulates wall time per named phase.

    Usage::

        timer = PhaseTimer()
        with timer("phase_a"):
            ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                          calls    total[s]     mean[ms]"]
        for name, total in sorted(
            self.totals.items(), key=lambda kv: -kv[1]
        ):
            n = self.counts[name]
            lines.append(
                f"{name:<30} {n:>5} {total:>11.4f} {1e3 * total / n:>12.3f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


#: Global timer used by the engines when profiling is enabled
GLOBAL_TIMER = PhaseTimer()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (TensorBoard format) for the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Annotate the enclosed host block so it appears on profiler traces."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:  # profiling must never break the computation
        yield
