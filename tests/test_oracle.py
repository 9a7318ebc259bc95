"""Oracle semantics tests — hand-computed cases for all 4 query types + padding."""

import numpy as np

from hvq_tpu.utils.formats import Dataset, QuerySet
from hvq_tpu.models.oracle import search_oracle


def tiny_ds():
    # 6 points on a line; C alternates 0/1; T = index.
    V = np.zeros((6, 100), dtype=np.float32)
    V[:, 0] = np.arange(6, dtype=np.float32)  # distances to origin: 0,1,4,9,16,25
    return Dataset(
        C=np.array([0, 1, 0, 1, 0, 1], np.float32),
        T=np.arange(6, dtype=np.float32),
        V=V,
    )


def q(qtype, v=-1.0, l=-1.0, r=-1.0):
    return QuerySet(
        qtype=np.array([qtype], np.int32),
        v=np.array([v], np.float32),
        l=np.array([l], np.float32),
        r=np.array([r], np.float32),
        V=np.zeros((1, 100), np.float32),
    )


def test_type0_plain_knn():
    ids, dists = search_oracle(tiny_ds(), q(0), k=3)
    np.testing.assert_array_equal(ids[0], [0, 1, 2])
    np.testing.assert_allclose(dists[0], [0, 1, 4])


def test_type1_categorical():
    ids, _ = search_oracle(tiny_ds(), q(1, v=1.0), k=3)
    np.testing.assert_array_equal(ids[0], [1, 3, 5])  # only C==1 rows


def test_type2_timestamp_range():
    ids, _ = search_oracle(tiny_ds(), q(2, l=2.0, r=4.0), k=3)
    np.testing.assert_array_equal(ids[0], [2, 3, 4])


def test_type3_both():
    ids, _ = search_oracle(tiny_ds(), q(3, v=0.0, l=1.0, r=5.0), k=2)
    np.testing.assert_array_equal(ids[0], [2, 4])


def test_padding_tail_ids():
    """<k candidates ⇒ fill with ids n-1, n-2, ... sorted by true distance
    (optimized.hpp:120-128): C==0 ∧ T∈[0,0] leaves only id 0; pads are 5 and 4,
    and the final order is by distance: 0 (d=0), 4 (d=16), 5 (d=25)."""
    ids, dists = search_oracle(tiny_ds(), q(3, v=0.0, l=0.0, r=0.0), k=3)
    np.testing.assert_array_equal(ids[0], [0, 4, 5])
    np.testing.assert_allclose(dists[0], [0, 16, 25])


def test_padding_duplicates_allowed():
    """A tail pad id may duplicate a real candidate (reference semantics)."""
    ids, _ = search_oracle(tiny_ds(), q(1, v=1.0), k=5)
    # candidates {1,3,5} (3 of them) + pads 5, 4 ⇒ id 5 appears twice
    assert sorted(ids[0].tolist()) == [1, 3, 4, 5, 5]


def test_sample_proportion():
    """Only the first sn records are scanned (optimized.hpp:85), but pads
    come from the full dataset tail."""
    ids, _ = search_oracle(tiny_ds(), q(0), k=3, sample_proportion=0.5)
    np.testing.assert_array_equal(ids[0], [0, 1, 2])
    ids2, _ = search_oracle(tiny_ds(), q(1, v=1.0), k=2, sample_proportion=0.5)
    # sn=3 ⇒ only candidate is id 1; pad with id 5 → order by dist: 1, 5
    np.testing.assert_array_equal(ids2[0], [1, 5])


# --- batched oracle ≡ scalar oracle ------------------------------------------

def test_batched_oracle_matches_scalar():
    from hvq_tpu.models.oracle import search_oracle_batched
    from hvq_tpu.utils.generators import generate_dataset, generate_queries
    from hvq_tpu.utils.compare import compare_distances, recall_at_k

    ds = generate_dataset(3000, seed=3, categories=25)
    qs = generate_queries(50, seed=4, categories=25)
    a_ids, a_d = search_oracle(ds, qs)
    b_ids, b_d = search_oracle_batched(ds, qs, qblock=7, dchunk=1 << 10)
    res = compare_distances(a_d, b_d)
    assert res.status == "same", res          # direct-formula recompute
    assert recall_at_k(b_ids, a_ids, b_d, a_d) == 1.0


def test_batched_oracle_sample_and_padding():
    from hvq_tpu.models.oracle import search_oracle_batched
    from hvq_tpu.utils.generators import generate_dataset, generate_queries
    from hvq_tpu.utils.compare import compare_distances

    ds = generate_dataset(1500, seed=9, categories=500)   # ~3 rows/category
    qs = generate_queries(16, seed=10, categories=500, types=(1, 3))
    for sp in (1.0, 0.37, 0.0):
        a_ids, a_d = search_oracle(ds, qs, sample_proportion=sp)
        b_ids, b_d = search_oracle_batched(
            ds, qs, sample_proportion=sp, qblock=5, dchunk=256
        )
        assert compare_distances(a_d, b_d).status == "same", sp
