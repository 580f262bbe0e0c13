"""Profiling hooks: per-phase wall timers and jax profiler traces.

The reference imports `timeit.default_timer` in every example but never
uses it (SURVEY.md section 5, tracing); here profiling is first-class:
`PhaseTimer` accumulates named-phase wall time (blocking on device work)
and `trace_annotation` wraps `jax.profiler.TraceAnnotation` so phases show
up in TensorBoard/perfetto traces captured with
`jax.profiler.start_trace(logdir)`.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:<28} {tot:9.3f} s  ({n} calls, "
                         f"{tot / n * 1e3:8.2f} ms/call)")
        return "\n".join(lines)


@contextmanager
def trace_annotation(name: str):
    try:
        import jax.profiler

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
