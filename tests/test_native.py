"""Native C++ runtime: format parity with the NumPy implementations."""

import numpy as np
import pytest

from hvq_tpu import native
from hvq_tpu.utils import formats
from hvq_tpu.utils.generators import generate_dataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_native_read_matches_numpy(tmp_path):
    ds = generate_dataset(257, seed=8)
    p = str(tmp_path / "d.bin")
    formats.write_data_bin(p, ds)
    rec = native.read_records(p, 102)
    np.testing.assert_array_equal(rec[:, 0], ds.C)
    np.testing.assert_array_equal(rec[:, 2:], ds.V)


def test_native_write_matches_numpy(tmp_path):
    rec = native.gen_data(123, seed=5, categories=7)
    p = str(tmp_path / "d.bin")
    native.write_records(p, rec)
    ds = formats.read_data_bin(p)  # numpy-or-native reader
    np.testing.assert_array_equal(ds.record_matrix(), rec)


def test_native_gen_semantics():
    d = native.gen_data(4000, seed=1, categories=0)
    assert -1 <= d[:, 0].min() and d[:, 0].max() <= 1
    assert -3 <= d[:, 1].min() and d[:, 1].max() <= 3
    assert -6 <= d[:, 2:].min() and d[:, 2:].max() <= 6
    q = native.gen_queries(4000, seed=2, categories=5)
    t = q[:, 0].astype(int)
    has_c = np.isin(t, (1, 3))
    has_t = np.isin(t, (2, 3))
    assert np.all(q[~has_c, 1] == -1)
    assert np.all(q[has_t, 3] >= q[has_t, 2])
    assert np.all(q[~has_t, 2] == -1)


def test_native_gen_deterministic():
    a = native.gen_data(100, seed=9, categories=3, threads=2)
    b = native.gen_data(100, seed=9, categories=3, threads=2)
    np.testing.assert_array_equal(a, b)


def test_perf_counters_graceful():
    with native.PerfCounters() as pc:
        np.dot(np.ones((100, 100)), np.ones((100, 100)))
    rep = pc.report()
    assert "task_clock_ns" in rep  # value may be -1 if syscall is blocked
    pc.close()
