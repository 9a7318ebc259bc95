"""Partitioned-engine differential tests + index-layer unit tests."""

import numpy as np
import pytest

from hvq_tpu.index.partition import (
    PartitionedIndex,
    pad_tile_list,
    tiles_for_ranges,
)
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.models.partitioned import PartitionedEngine
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


def test_query_ranges_exact():
    """Ranges must cover exactly the predicate-passing rows."""
    ds = generate_dataset(3000, seed=1, categories=12)
    qs = generate_queries(200, seed=2, categories=12)
    idx = PartitionedIndex.build(ds, db_tile=256)
    view_id, start, end = idx.query_ranges(qs.qtype, qs.v, qs.l, qs.r)
    for i in range(qs.m):
        t = int(qs.qtype[i])
        if t in (1, 3):
            passing = ds.C == qs.v[i]
            if t == 3:
                passing &= (ds.T >= qs.l[i]) & (ds.T <= qs.r[i])
            assert view_id[i] == 0
        elif t == 2:
            passing = (ds.T >= qs.l[i]) & (ds.T <= qs.r[i])
            assert view_id[i] == 1
        else:
            assert (start[i], end[i]) == (0, ds.n)
            continue
        assert end[i] - start[i] == passing.sum(), f"query {i} type {t}"


def test_tiles_for_ranges():
    t = tiles_for_ranges(np.array([0, 700]), np.array([100, 800]), 256, 8)
    np.testing.assert_array_equal(t, [0, 2, 3])
    assert tiles_for_ranges(np.array([5]), np.array([5]), 256, 8).size == 0
    padded = pad_tile_list(np.array([1, 2, 3], np.int32))
    assert padded.size == 4 and padded[-1] == -1


@pytest.fixture(scope="module")
def part_engine(small_ds):
    return PartitionedEngine(small_ds, db_tile=128, query_batch=32)


def test_partitioned_matches_oracle(small_ds, small_qs, oracle_small, part_engine):
    oids, odists = oracle_small
    ids, dists = part_engine.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_partitioned_all_types(small_ds, part_engine):
    for qtype in (0, 1, 2, 3):
        qs = generate_queries(16, seed=200 + qtype, categories=20, types=(qtype,))
        oids, odists = search_oracle(small_ds, qs)
        ids, dists = part_engine.search(qs)
        assert_results_match(small_ds, qs, ids, dists, oids, odists)


def test_partitioned_sample_proportion(small_ds, small_qs, part_engine):
    """sn applies to ORIGINAL file order even though views are reordered."""
    oids, odists = search_oracle(small_ds, small_qs, sample_proportion=0.41)
    ids, dists = part_engine.search(small_qs, sample_proportion=0.41)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_partitioned_full_scan_route():
    """Wide ranges take the deferred full-scan route; results stay exact."""
    ds = generate_dataset(131072, seed=60, categories=10)
    qs = generate_queries(16, seed=61, categories=10)
    eng = PartitionedEngine(ds, db_tile=2048, query_batch=16)
    assert eng.bin_top is not None
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_partitioned_empty_predicate():
    """A category value matching nothing → all tail padding."""
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(600, seed=5, categories=4)
    qs = QuerySet(
        qtype=np.array([1], np.int32),
        v=np.array([0.123456], np.float32),  # not a category level
        l=np.array([-1], np.float32),
        r=np.array([-1], np.float32),
        V=np.zeros((1, 100), np.float32),
    )
    eng = PartitionedEngine(ds, db_tile=128, query_batch=8)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    # all results are tail pads n-1..n-100 in distance order
    assert set(ids[0]) == set(range(500, 600))


def test_routed_bucket_boundaries():
    """Spans right at the bucket caps route correctly and stay exact."""
    ds = generate_dataset(20000, seed=70, categories=5)   # ~4000 rows/cat
    eng = PartitionedEngine(ds, db_tile=1024, query_batch=64,
                            route_buckets=(4096, 8192), routed_batch=64)
    # categories of ~4000 rows straddle the first bucket cap
    qs = generate_queries(48, seed=71, categories=5, types=(1, 3))
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_routed_narrow_type2_time_view():
    """Very narrow T ranges route type-2 queries through the time view."""
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(30000, seed=72, categories=8)
    rng = np.random.default_rng(73)
    ls = rng.uniform(-2, 2, 16).astype(np.float32)
    qs = QuerySet(
        qtype=np.full(16, 2, np.int32),
        v=np.full(16, -1.0, np.float32),
        l=ls,
        r=(ls + 0.01).astype(np.float32),    # ~0.2% selectivity
        V=rng.uniform(-6, 6, (16, 100)).astype(np.float32),
    )
    eng = PartitionedEngine(ds, db_tile=1024, query_batch=16,
                            route_buckets=(2048,), routed_batch=16,
                            time_view_min_queries=1)
    view_id, start, end = eng.index.query_ranges(qs.qtype, qs.v, qs.l, qs.r)
    assert (view_id == 1).all() and ((end - start) <= 2048).all()
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert eng.index._time_view is not None      # the T-sorted copy was used
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_time_view_economics_gate():
    """A handful of narrow type-2 queries must NOT materialize the second
    full database copy — they reroute to the dense path, results identical
    (the 10⁷ set pays 5.1 GB HBM + a ~130 s upload for the copy)."""
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(30000, seed=72, categories=8)
    rng = np.random.default_rng(74)
    ls = rng.uniform(-2, 2, 8).astype(np.float32)
    qs = QuerySet(
        qtype=np.full(8, 2, np.int32),
        v=np.full(8, -1.0, np.float32),
        l=ls,
        r=(ls + 0.01).astype(np.float32),
        V=rng.uniform(-6, 6, (8, 100)).astype(np.float32),
    )
    eng = PartitionedEngine(ds, db_tile=1024, query_batch=16,
                            route_buckets=(2048,), routed_batch=16)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert eng.index._time_view is None          # gate held: no 2nd copy
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_time_view_is_lazy():
    """No narrow type-2 queries → the T-sorted device copy never builds."""
    ds = generate_dataset(5000, seed=80, categories=10)
    eng = PartitionedEngine(ds, db_tile=512, query_batch=32,
                            route_buckets=(256,), routed_batch=32,
                            time_view_min_queries=1)
    assert eng.index._time_view is None
    qs = generate_queries(16, seed=81, categories=10, types=(0, 1, 3))
    eng.search(qs)                       # cat-view routes only
    assert eng.index._time_view is None
    # wide type-2 queries reroute to the cat view's dense scan: still lazy
    from hvq_tpu.utils.formats import QuerySet

    rng = np.random.default_rng(82)
    qs2 = QuerySet(
        qtype=np.full(8, 2, np.int32),
        v=np.full(8, -1.0, np.float32),
        l=np.full(8, -3.0, np.float32),
        r=np.full(8, 4.0, np.float32),       # full-T range: always wide
        V=rng.uniform(-6, 6, (8, 100)).astype(np.float32),
    )
    eng.search(qs2)
    assert eng.index._time_view is None
    # a genuinely narrow type-2 range DOES materialize it
    qs3 = QuerySet(
        qtype=np.array([2], np.int32),
        v=np.array([-1.0], np.float32),
        l=np.array([0.0], np.float32),
        r=np.array([0.001], np.float32),
        V=rng.uniform(-6, 6, (1, 100)).astype(np.float32),
    )
    from hvq_tpu.models.oracle import search_oracle

    ids, dists = eng.search(qs3)
    assert eng.index._time_view is not None
    oids, odists = search_oracle(ds, qs3)
    assert_results_match(ds, qs3, ids, dists, oids, odists)


def test_pack_groups_invariants():
    """Grouped-window packer: every group respects size ≤ route_group,
    window width ≤ its cap, and every member's [start, end) lies inside
    [g_start, g_start + cap)."""
    ds = generate_dataset(20000, seed=9, categories=50)
    eng = PartitionedEngine(ds, db_tile=1024, query_batch=32,
                            route_buckets=(512, 2048), route_group=4)
    qs = generate_queries(300, seed=10, categories=50, types=(1, 2, 3))
    view_id, start, end = eng.index.query_ranges(qs.qtype, qs.v, qs.l, qs.r)
    span = end - start
    routable = (span <= eng.route_buckets[-1]) & (span < ds.n)
    q_idx = np.nonzero(routable & (view_id == 0))[0]
    assert q_idx.size > 50
    by_cap = eng._pack_groups(start, end, q_idx)
    seen = []
    for cap, groups in by_cap.items():
        assert cap in eng.route_buckets
        for g_start, members in groups:
            assert 1 <= len(members) <= eng.route_group
            for q in members:
                assert g_start <= start[q] and end[q] <= g_start + cap
            seen.extend(members)
    assert sorted(seen) == sorted(q_idx.tolist())


def test_windowed_wide_type2():
    """Wide type-2 batches ride the certified scan over a T-sorted tile
    window (≤ nt/2) instead of the full database; results stay exact."""
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(131072, seed=90, categories=10)
    rng = np.random.default_rng(91)
    m = 256
    ls = rng.uniform(0.5, 2.5, m).astype(np.float32)   # upper-half starts
    qs = QuerySet(
        qtype=np.full(m, 2, np.int32),
        v=np.full(m, -1.0, np.float32),
        l=ls,
        r=rng.uniform(ls, 4.0).astype(np.float32),     # wide, reaches T max
        V=rng.uniform(-6, 6, (m, 100)).astype(np.float32),
    )
    eng = PartitionedEngine(ds, db_tile=2048, query_batch=128,
                            time_view_min_queries=1)
    assert eng.bin_top is not None
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert eng.index._time_view is not None     # the windowed path engaged
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_windowed_mixed_workload_exact():
    """All four types through routing + windows + dense in one call."""
    ds = generate_dataset(131072, seed=92, categories=30)
    qs = generate_queries(512, seed=93, categories=30)
    eng = PartitionedEngine(ds, db_tile=2048, query_batch=128,
                            time_view_min_queries=8)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
