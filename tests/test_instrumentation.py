"""In-search phase breakdown + counter plumbing (VERDICT r1 missing #2/#3).

The reference dumps dist/check/sort/merge splits per run
(include/optimized.hpp:133-145) and brackets vec_query with PerfEvent
(src/test.cpp:82-92). The TPU analogues: engines accept a PhaseTimer for
the host-visible pack/upload/enqueue/fetch/rerun split, and the CLI wraps
the timed region in native PerfCounters (no-op when unavailable).
"""

import numpy as np

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.utils.timing import PhaseTimer
from hvq_tpu.utils.generators import generate_dataset, generate_queries


def test_batched_search_phase_breakdown(small_ds, small_qs):
    eng = BatchedEngine(small_ds, db_tile=512, query_batch=64)
    timer = PhaseTimer()
    ids, dists = eng.search(small_qs, phases=timer)
    assert ids.shape == (small_qs.m, 100)
    for name in ("search/pack", "search/upload", "search/enqueue",
                 "search/fetch"):
        assert name in timer.totals, timer.totals
        assert timer.totals[name] >= 0.0


def test_partitioned_search_phase_breakdown(small_ds, small_qs):
    from hvq_tpu.models.partitioned import PartitionedEngine

    eng = PartitionedEngine(small_ds, query_batch=64)
    timer = PhaseTimer()
    ids, _ = eng.search(small_qs, phases=timer)
    assert ids.shape == (small_qs.m, 100)
    assert "search/route" in timer.totals
    assert "search/enqueue" in timer.totals
    assert "search/fetch" in timer.totals


def test_save_knn_arbitrary_k_roundtrip(tmp_path):
    from hvq_tpu.utils import formats

    ids = np.arange(7 * 50, dtype=np.uint32).reshape(7, 50)
    p = tmp_path / "o.bin"
    formats.save_knn(ids, p)
    back = formats.read_knn(p, k=50)
    np.testing.assert_array_equal(back, ids)


def test_read_dist_infers_k(tmp_path):
    from hvq_tpu.utils import formats

    d = np.random.default_rng(0).random((9, 37)).astype(np.float32)
    p = str(tmp_path / "x.dist")
    with open(p, "wb") as f:
        np.uint32(9).tofile(f)
        d.tofile(f)
    back = formats.read_dist(p)            # k inferred from header + size
    np.testing.assert_array_equal(back, d)
    back2 = formats.read_dist(p, k=37)     # explicit k still enforced
    np.testing.assert_array_equal(back2, d)
    # truncated file → clean ValueError (k no longer divides the payload)
    raw = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(raw[:-10])
    try:
        formats.read_dist(p, k=37)
        raise AssertionError("expected ValueError on truncated file")
    except ValueError:
        pass
