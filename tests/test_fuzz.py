"""Randomized differential fuzz: engines vs the float64 oracle.

Seeded (deterministic) random configurations sweep the interaction space
the targeted tests cover one axis at a time: odd sizes, k values, type
mixes, category cardinality, sample proportions. The contract checked is
the product one — recomputed distances within tolerance AND multiset
recall 1.0 (reference compare_data.cpp semantics, SURVEY.md §4).
"""

import numpy as np
import pytest

import hvq_tpu
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.compare import compare_distances, recall_at_k
from hvq_tpu.utils.formats import recompute_result_distances
from hvq_tpu.utils.generators import generate_dataset, generate_queries

CASES = [
    # (seed, n, m, cats, k, sample, engine)
    (101, 3777, 29, 12, 10, 1.0, "batched"),
    (102, 2048, 64, 500, 100, 1.0, "partitioned"),  # ~4-row categories
    (103, 5211, 33, 7, 100, 0.37, "batched"),
    (104, 4096, 48, 25, 12, 0.5, "partitioned"),
    (105, 6000, 40, 3, 100, 1.0, "partitioned"),    # giant partitions
]


@pytest.mark.parametrize("seed,n,m,cats,k,sample,engine", CASES)
def test_fuzz_differential(seed, n, m, cats, k, sample, engine):
    ds = generate_dataset(n, seed=seed, categories=cats)
    qs = generate_queries(m, seed=seed + 1, categories=cats)
    eng = hvq_tpu.get_engine(engine)(ds, db_tile=1024, query_batch=16)
    ids, dists = eng.search(qs, k=k, sample_proportion=sample)
    oids, odists = search_oracle(ds, qs, k=k, sample_proportion=sample)
    res = compare_distances(
        recompute_result_distances(ds, qs, ids.astype(np.int64)),
        recompute_result_distances(ds, qs, oids.astype(np.int64)),
    )
    assert res.ok, f"distance contract violated: {res}"
    assert recall_at_k(ids, oids, dists, odists) == 1.0
