"""ctypes bindings for the C++ host runtime (libhvq_native.so).

Provides mmap-based binary IO, threaded synthetic generation, and
perf_event hardware counters — the host-side roles the reference implements
in C/C++ (include/io.h, src/write_data.c, include/perfevent.hpp). Every entry
point degrades gracefully: ``available()`` is False when the library can't
be built/loaded and callers fall back to the NumPy implementations in
hvq_tpu.utils.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhvq_native.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.hvq_read_records.restype = ctypes.c_longlong
    lib.hvq_read_records.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
    ]
    lib.hvq_record_count.restype = ctypes.c_longlong
    lib.hvq_record_count.argtypes = [ctypes.c_char_p]
    lib.hvq_write_records.restype = ctypes.c_int
    lib.hvq_write_records.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong, ctypes.c_longlong,
    ]
    lib.hvq_gen_data.restype = None
    lib.hvq_gen_data.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
    ]
    lib.hvq_gen_queries.restype = None
    lib.hvq_gen_queries.argtypes = list(lib.hvq_gen_data.argtypes)
    lib.hvq_perf_open.restype = ctypes.c_void_p
    lib.hvq_perf_start.argtypes = [ctypes.c_void_p]
    lib.hvq_perf_stop.argtypes = [ctypes.c_void_p]
    lib.hvq_perf_read.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double)]
    lib.hvq_perf_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_records(path: str, record_dim: int, threads: int = 0) -> np.ndarray:
    """Read a count-prefixed record file via mmap; (N, record_dim) float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.hvq_record_count(path.encode())
    if n < 0:
        raise IOError(f"cannot read record count from {path}")
    out = np.empty((n, record_dim), dtype=np.float32)
    got = lib.hvq_read_records(path.encode(), record_dim, _fptr(out), n, threads)
    if got != n:
        raise IOError(f"short read from {path}: {got} != {n}")
    return out


def write_records(path: str, records: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    rec = np.ascontiguousarray(records, dtype=np.float32)
    if lib.hvq_write_records(
        path.encode(), _fptr(rec), rec.shape[0], rec.shape[1]
    ) != 0:
        raise IOError(f"write failed: {path}")


def gen_data(n: int, seed: int = 0, categories: int = 0,
             threads: int = 0) -> np.ndarray:
    """(n, 102) records with write_data.c value semantics, threaded."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((n, 102), dtype=np.float32)
    lib.hvq_gen_data(_fptr(out), n, seed, categories, threads)
    return out


def gen_queries(m: int, seed: int = 1, categories: int = 0,
                threads: int = 0) -> np.ndarray:
    """(m, 104) queries with write_query.c semantics, threaded."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = np.empty((m, 104), dtype=np.float32)
    lib.hvq_gen_queries(_fptr(out), m, seed, categories, threads)
    return out


PERF_COUNTER_NAMES = (
    "cycles", "kcycles", "instructions", "L1d_misses",
    "LLC_misses", "branch_misses", "task_clock_ns",
)


class PerfCounters:
    """Host HW counters (perfevent.hpp analogue). No-ops when unavailable.

    >>> with PerfCounters() as pc:
    ...     work()
    >>> pc.report()   # {'cycles': ..., 'IPC': ...}
    """

    def __init__(self):
        lib = _load()
        self._lib = lib
        self._h = lib.hvq_perf_open() if lib else None
        self.values: dict[str, float] = {}

    def __enter__(self):
        if self._h:
            self._lib.hvq_perf_start(self._h)
        return self

    def __exit__(self, *exc):
        if self._h:
            self._lib.hvq_perf_stop(self._h)
            buf = (ctypes.c_double * 7)()
            self._lib.hvq_perf_read(self._h, buf)
            vals = dict(zip(PERF_COUNTER_NAMES, buf))
            # perf_event_open can be denied per counter (containers with
            # perf_event_paranoid/seccomp restrictions): failed fds read
            # back negative. Keep only the counters that actually ran
            # (often just task_clock) instead of reporting -1 columns.
            self.values = {k: v for k, v in vals.items() if v >= 0}
        return False

    def close(self):
        if self._h:
            self._lib.hvq_perf_close(self._h)
            self._h = None

    def report(self) -> dict:
        out = dict(self.values)
        cyc = out.get("cycles", -1)
        ins = out.get("instructions", -1)
        if cyc and cyc > 0 and ins > 0:
            out["IPC"] = ins / cyc
        tc = out.get("task_clock_ns", -1)
        if tc and tc > 0 and cyc > 0:
            out["GHz"] = cyc / tc
        return out
