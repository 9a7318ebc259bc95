"""Index checkpoint round-trip: saved and reloaded indexes answer identically."""

import numpy as np

from hvq_tpu.index.ivf import IVFIndex
from hvq_tpu.index.partition import PartitionedIndex
from hvq_tpu.index.serialize import load_index, save_ivf, save_partitioned
from hvq_tpu.models.ivf import IVFEngine
from hvq_tpu.models.partitioned import PartitionedEngine
from hvq_tpu.utils.generators import generate_dataset, generate_queries


def test_partitioned_roundtrip(tmp_path, small_ds, small_qs):
    idx = PartitionedIndex.build(small_ds, db_tile=128)
    p = tmp_path / "part.npz"
    save_partitioned(idx, p)
    idx2 = load_index(p)
    assert isinstance(idx2, PartitionedIndex)
    e1 = PartitionedEngine(small_ds, db_tile=128, query_batch=32, index=idx)
    e2 = PartitionedEngine(small_ds, db_tile=128, query_batch=32, index=idx2)
    ids1, d1 = e1.search(small_qs)
    ids2, d2 = e2.search(small_qs)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(d1, d2)


def test_ivf_roundtrip(tmp_path):
    ds = generate_dataset(4000, seed=6, categories=8, clusters=16)
    qs = generate_queries(16, seed=7, categories=8, clusters=16, centers_seed=6)
    idx = IVFIndex.build(ds, cap=128, iters=3)
    p = tmp_path / "ivf.npz"
    save_ivf(idx, p)
    idx2 = load_index(p)
    assert isinstance(idx2, IVFIndex)
    e1 = IVFEngine(ds, query_batch=16, index=idx)
    e2 = IVFEngine(ds, query_batch=16, index=idx2)
    ids1, d1 = e1.search(qs)
    ids2, d2 = e2.search(qs)
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_array_equal(d1, d2)
