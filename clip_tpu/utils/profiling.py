"""Profiling & tracing utilities.

The reference's observability is wall-clock printf brackets
(``ggml_time_us`` in examples/main.cpp:45-55, tests/benchmark.cpp:57-163) and
optional gprof builds.  The TPU-native equivalents:

* :class:`StageTimer` — named wall-clock stages with a report (the printf
  bracket, structured);
* :func:`trace` — ``jax.profiler`` trace context producing TensorBoard-able
  device profiles;
* :func:`compiled_hlo` — dump a jitted function's optimized HLO for kernel
  inspection (what the reference's CLIP_DEBUG tensor dumps approximate).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class StageTimer:
    """Collect named stage durations; ``report()`` renders a table."""

    def __init__(self) -> None:
        self.stages: "OrderedDict[str, float]" = OrderedDict()
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def ms(self, name: str) -> float:
        return self.stages.get(name, 0.0) * 1000.0

    def report(self) -> str:
        lines = ["stage                          total ms    calls   ms/call"]
        for name, total in self.stages.items():
            n = self.counts[name]
            lines.append(f"{name:<30} {total*1e3:9.2f} {n:8d} {total*1e3/n:9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device+host profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_hlo(fn, *example_args, **kw) -> str:
    """Optimized HLO text of ``jax.jit(fn)`` on the example arguments."""
    import jax

    lowered = jax.jit(fn, **kw).lower(*example_args)
    return lowered.compile().as_text()
