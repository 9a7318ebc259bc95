"""Sharded partitioned engine: differential tests on the 8-device CPU mesh.

VERDICT r2 #3: the mixed-workload flagship must scale past one chip. These
tests pin (a) the oracle distance contract + recall 1.0 over the mesh,
(b) agreement with the single-chip partitioned engine on the same data,
(c) routed/full routing across all query types, slab-straddling spans, and
the original-file-order sample_proportion semantics.
"""

import numpy as np
import pytest

from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.models.partitioned import PartitionedEngine
from hvq_tpu.models.partitioned_sharded import ShardedPartitionedEngine
from hvq_tpu.parallel.mesh import make_mesh
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh()  # all 8 virtual CPU devices on "d"


@pytest.fixture(scope="module")
def ps_engine(small_ds, mesh8):
    return ShardedPartitionedEngine(
        small_ds, mesh=mesh8, db_tile=128, query_batch=32
    )


def test_matches_oracle(small_ds, small_qs, oracle_small, ps_engine):
    oids, odists = oracle_small
    ids, dists = ps_engine.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_matches_single_chip(small_ds, small_qs, ps_engine):
    """Same data, same algorithm family: the mesh result must satisfy the
    distance contract against the single-chip partitioned engine (ids may
    reorder on exact ties, as the reference tolerates: compare_data.cpp)."""
    single = PartitionedEngine(small_ds, db_tile=128, query_batch=32)
    sids, sdists = single.search(small_qs)
    ids, dists = ps_engine.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, sids, sdists)
    assert recall_at_k(ids, sids, dists, sdists) == 1.0


def test_all_types(small_ds, ps_engine):
    for qtype in (0, 1, 2, 3):
        qs = generate_queries(
            16, seed=300 + qtype, categories=20, types=(qtype,)
        )
        oids, odists = search_oracle(small_ds, qs)
        ids, dists = ps_engine.search(qs)
        assert_results_match(small_ds, qs, ids, dists, oids, odists)


def test_sample_proportion(small_ds, small_qs, ps_engine):
    """sn applies to ORIGINAL file order across shard slabs (the oid
    column rides the permutation through the mesh)."""
    oids, odists = search_oracle(small_ds, small_qs, sample_proportion=0.37)
    ids, dists = ps_engine.search(small_qs, sample_proportion=0.37)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_slab_straddling_spans_go_dense(small_ds, small_qs, ps_engine):
    """_routable_extra rejects spans crossing a slab boundary; they must
    still produce exact results via the dense path."""
    view, start, end = ps_engine.index.query_ranges(
        small_qs.qtype, small_qs.v, small_qs.l, small_qs.r
    )
    extra = ps_engine._routable_extra(start, end)
    ln = ps_engine._local_n
    crosses = (start // ln) != (np.maximum(end - 1, start) // ln)
    np.testing.assert_array_equal(extra, ~crosses)


def test_full_scan_packed_route(mesh8):
    """A DB large enough for a sound per-shard bin depth exercises the
    sharded certified packed scan + repair + merge."""
    ds = generate_dataset(131072, seed=70, categories=10)
    qs = generate_queries(32, seed=71, categories=10)
    eng = ShardedPartitionedEngine(
        ds, mesh=mesh8, db_tile=2048, query_batch=32
    )
    assert eng.bin_top is not None, "expected the packed path at this size"
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_cert_forensics_parity(small_ds, small_qs, mesh8, monkeypatch):
    """HVQ_CERT_TERMS bitmask survives the mesh (pmin per term)."""
    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    eng = ShardedPartitionedEngine(
        small_ds, mesh=mesh8, db_tile=128, query_batch=32
    )
    eng.search(small_qs)
    assert eng._last_cert_terms is not None
    assert eng._last_cert_terms.shape == (small_qs.m,)
