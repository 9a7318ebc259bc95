"""Generator semantics tests (src/write_data.c / src/write_query.c parity)."""

import numpy as np

from hvq_tpu.utils.generators import generate_dataset, generate_queries


def test_data_value_ranges():
    ds = generate_dataset(5000, seed=0)
    assert ds.C.min() >= -1 and ds.C.max() <= 1       # write_data.c:29
    assert ds.T.min() >= -3 and ds.T.max() <= 3       # write_data.c:33
    assert ds.V.min() >= -6 and ds.V.max() <= 6       # write_data.c:38
    assert ds.V.shape == (5000, 100)
    assert ds.V.dtype == np.float32


def test_data_deterministic():
    a = generate_dataset(100, seed=42)
    b = generate_dataset(100, seed=42)
    np.testing.assert_array_equal(a.V, b.V)


def test_query_field_consistency():
    """v/l/r are -1 exactly when the type doesn't use them (write_query.c:32-50)."""
    qs = generate_queries(5000, seed=1)
    has_c = np.isin(qs.qtype, (1, 3))
    has_t = np.isin(qs.qtype, (2, 3))
    assert np.all(qs.v[~has_c] == -1)
    assert np.all(qs.l[~has_t] == -1)
    assert np.all(qs.r[~has_t] == -1)
    # r ~ U[l, 4]: the range is never empty (write_query.c:47)
    assert np.all(qs.r[has_t] >= qs.l[has_t])
    assert np.all(qs.r[has_t] <= 4)
    assert set(np.unique(qs.qtype)) <= {0, 1, 2, 3}


def test_discretized_categories():
    ds = generate_dataset(1000, seed=2, categories=10)
    qs = generate_queries(1000, seed=3, categories=10)
    assert np.unique(ds.C).size <= 10
    # query v values (where active) come from the same discretized levels
    active_v = qs.v[np.isin(qs.qtype, (1, 3))]
    assert np.all(np.isin(active_v, np.unique(ds.C)))


def test_types_restriction():
    qs = generate_queries(200, seed=4, types=(2,))
    assert np.all(qs.qtype == 2)
