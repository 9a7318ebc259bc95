"""Profiler integration — the PerfEvent/jax.profiler tier (SURVEY.md §5).

The reference wraps its query loop in ``perf_event_open`` hardware counters
(src/test.cpp:82-92, include/perfevent.hpp). On TPU the equivalent telemetry
comes from three places, all wrapped here:

* ``jax.profiler`` traces (op-level timeline, viewable in TensorBoard /
  Perfetto) — ``trace()`` context manager;
* XLA cost analysis of a compiled function — ``cost_analysis()`` returns
  flops / bytes-accessed estimates, the static analogue of the reference's
  measured instruction counts;
* live device memory — ``device_memory_stats()``, the analogue of the
  reference's optional MEM_TRACK allocation counter (util.h:74-97).

Host-side hardware counters (the literal perfevent capability) live in
``hvq_tpu.native.PerfCounters``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block of dispatches."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> dict:
    """Static XLA cost estimate (flops, bytes) of ``jit(fn)(*args)``."""
    import jax

    lowered = jax.jit(fn, **kwargs).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older JAX returns one dict per device
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}


def device_memory_stats(device=None) -> dict:
    """Live HBM usage for one device (bytes). Empty dict if unsupported."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def summarize_bytes(num: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(num) < 1024:
            return f"{num:.2f} {unit}"
        num /= 1024
    return f"{num:.2f} PiB"
