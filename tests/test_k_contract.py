"""k ≠ 100 contract: ``search(k=...)`` is a runtime parameter, but the
id-packing mode is chosen at engine construction from ``_c.K_DEFAULT``
(models/batched.py id_pack_mode) — these tests pin that every engine's
bundle/unbundle pair stays consistent for small, odd, and wider-than-default
k against the oracle (VERDICT r3 #7).
"""

import numpy as np
import pytest

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.models.partitioned import PartitionedEngine
from hvq_tpu.models.sharded import ShardedEngine
from hvq_tpu.models.oracle import search_oracle

from conftest import assert_results_match


def _check(engine, ds, qs, k):
    oids, odists = search_oracle(ds, qs, k=k)
    ids, dists = engine.search(qs, k=k)
    assert ids.shape == (qs.m, k)
    assert dists.shape == (qs.m, k)
    assert_results_match(ds, qs, ids, dists, oids, odists)


@pytest.mark.parametrize("k", [10, 128])
def test_batched_k(small_ds, small_qs, k):
    eng = BatchedEngine(small_ds, db_tile=256, query_batch=32, kprime=128)
    _check(eng, small_ds, small_qs, k)


def test_batched_odd_k(small_ds, small_qs):
    # odd k cannot pack 2-per-lane: bundle_ids must fall through unpacked
    # and unbundle_ids must agree (the parity guards on both sides)
    eng = BatchedEngine(small_ds, db_tile=256, query_batch=32, kprime=128)
    _check(eng, small_ds, small_qs, 7)


@pytest.mark.parametrize("k", [10, 128])
def test_partitioned_k(small_ds, small_qs, k):
    eng = PartitionedEngine(
        small_ds, db_tile=256, query_batch=32, kprime=128,
        route_buckets=(256, 1024),
    )
    _check(eng, small_ds, small_qs, k)


def test_sharded_k(small_ds, small_qs):
    eng = ShardedEngine(small_ds, db_tile=128, query_batch=32, kprime=128)
    _check(eng, small_ds, small_qs, 10)
