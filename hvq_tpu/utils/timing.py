"""Phase timing + counters — the PERF_DBG / PerfEvent analogue.

The reference instruments with two tiers (SURVEY.md §5): rdtsc phase timers
accumulated into global atomics (util.h:16-29, optimized_impl.h:172-177) and
``perf_event_open`` hardware counters around the whole query loop
(perfevent.hpp:44-320, src/test.cpp:82-92). On TPU the equivalents are:

* wall-clock phase timers with ``jax.block_until_ready`` fencing (this
  module) — async dispatch makes unfenced timing meaningless;
* ``jax.profiler`` traces for op-level breakdowns (utils/profiling.py);
* host-side HW counters via the native PerfEvent wrapper
  (hvq_tpu/native) when built — same counter set as the reference.

Counters are explicit objects, not globals: JAX's functional style means
instrumentation happens at dispatch boundaries, not inside kernels.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    """Named accumulating phase timers (the PERF_DBG counter set).

    >>> t = PhaseTimer()
    >>> with t.phase("dist"):   # fences device work when given arrays
    ...     out = f(x)
    >>> t.report()
    """

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def phase(self, name: str, *fence):
        """Time a block; pass device arrays in ``fence`` to block on them."""
        import jax

        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence:
                jax.block_until_ready(fence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float, n: int = 1) -> None:
        self.totals[name] += seconds
        self.counts[name] += n

    def report(self, stream=None) -> str:
        """Stderr-style phase dump (cf. optimized.hpp:133-145)."""
        import sys

        lines = [
            f"{name}: \t{self.totals[name] * 1e3:.3f} ms "
            f"(n={self.counts[name]})"
            for name in sorted(self.totals)
        ]
        text = "\n".join(lines)
        print(text, file=stream or sys.stderr)
        return text


@contextlib.contextmanager
def maybe_phase(timer: "PhaseTimer | None", name: str):
    """``timer.phase(name)`` when a timer is given, else a no-op.

    Lets engines accept an optional PhaseTimer (the driver's in-search
    breakdown, cf. the reference's dist/check/sort/merge stderr dump,
    optimized.hpp:133-145) without branching at every call site.
    """
    if timer is None:
        yield
    else:
        with timer.phase(name):
            yield


@contextlib.contextmanager
def track_host_memory():
    """Peak host allocation inside the block — the MEM_TRACK analogue.

    The reference's optional global new/delete byte counter (util.h:74-97)
    tracks heap traffic; here tracemalloc reports (current, peak) bytes via
    the returned dict after the block exits. Device-side memory lives in
    utils.profiling.device_memory_stats.
    """
    import tracemalloc

    was_tracing = tracemalloc.is_tracing()
    if not was_tracing:
        tracemalloc.start()
    tracemalloc.reset_peak()
    out = {}
    try:
        yield out
    finally:
        out["current_bytes"], out["peak_bytes"] = tracemalloc.get_traced_memory()
        if not was_tracing:
            tracemalloc.stop()


def time_fn(fn, *args, warmup: int = 1, iters: int = 3) -> float:
    """Best-of-n wall time of a dispatchable, fenced. Returns seconds."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best
