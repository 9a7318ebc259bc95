"""Differential tests: every optimized engine vs the oracle (SURVEY.md §4).

The contract is the reference's: recomputed distances within 0.002
(src/compare_data.cpp:5), never raw ids (optimized.hpp:34-41 rationale).
We additionally check exact-path recall@100 == 1.0 with distance-tie credit.
"""

import numpy as np
import pytest

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.models.sharded import ShardedEngine
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


@pytest.fixture(scope="module")
def batched(small_ds):
    return BatchedEngine(small_ds, db_tile=256, query_batch=32, kprime=128)


def test_batched_matches_oracle(small_ds, small_qs, oracle_small, batched):
    oids, odists = oracle_small
    ids, dists = batched.search(small_qs)
    assert ids.shape == (small_qs.m, 100)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)
    rec = recall_at_k(ids, oids, dists, odists)
    assert rec == 1.0, f"exact engine recall {rec} < 1.0"


def test_batched_all_types_individually(small_ds):
    from hvq_tpu.models.oracle import search_oracle

    eng = BatchedEngine(small_ds, db_tile=512, query_batch=16)
    for qtype in (0, 1, 2, 3):
        qs = generate_queries(16, seed=100 + qtype, categories=20, types=(qtype,))
        oids, odists = search_oracle(small_ds, qs)
        ids, dists = eng.search(qs)
        assert_results_match(small_ds, qs, ids, dists, oids, odists)


def test_batched_sample_proportion(small_ds, small_qs, batched):
    from hvq_tpu.models.oracle import search_oracle

    oids, odists = search_oracle(small_ds, small_qs, sample_proportion=0.37)
    ids, dists = batched.search(small_qs, sample_proportion=0.37)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_batched_heavy_padding():
    """A category value with almost no rows forces the tail-pad path."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(1500, seed=9, categories=500)  # ~3 rows/category
    qs = generate_queries(8, seed=10, categories=500, types=(1, 3))
    oids, odists = search_oracle(ds, qs)
    eng = BatchedEngine(ds, db_tile=256, query_batch=8)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)


def test_batched_nondivisible_sizes():
    """Row/query counts that don't divide the tiles exercise the padding."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(777, seed=12, categories=5)
    qs = generate_queries(13, seed=13, categories=5)
    eng = BatchedEngine(ds, db_tile=256, query_batch=8)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)


def test_sharded_matches_oracle(small_ds, small_qs, oracle_small):
    import jax

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    eng = ShardedEngine(small_ds, db_tile=64, query_batch=32, kprime=128)
    oids, odists = oracle_small
    ids, dists = eng.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)
    rec = recall_at_k(ids, oids, dists, odists)
    assert rec == 1.0


def test_sharded_query_axis(small_ds, small_qs, oracle_small):
    """2×4 (q, d) mesh: queries sharded too."""
    from hvq_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_db_shards=4, n_query_shards=2)
    eng = ShardedEngine(
        small_ds, mesh=mesh, db_tile=64, query_batch=32, kprime=128
    )
    oids, odists = oracle_small
    ids, dists = eng.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_sharded_pallas_scan():
    """Per-shard fused Pallas kernel inside shard_map (interpret on CPU)."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(262144, seed=40, categories=20)
    qs = generate_queries(16, seed=41, categories=20)
    eng = ShardedEngine(ds, db_tile=512, query_batch=16, scan_impl="pallas")
    # kernel_bin_top rounds 8 up to 32 so out_w = 32·4 = 128 (Mosaic block)
    assert eng.scan_impl == "pallas" and eng.bin_top == 32
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_sharded_padding_path(small_ds):
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(1200, seed=21, categories=400)
    qs = generate_queries(8, seed=22, categories=400, types=(1, 3))
    eng = ShardedEngine(ds, db_tile=32, query_batch=8)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)


def test_arbitrary_k(small_ds, small_qs):
    """The engine API supports k != 100 (the file format alone fixes 100)."""
    from hvq_tpu.models.oracle import search_oracle

    eng = BatchedEngine(small_ds, db_tile=256, query_batch=32)
    for k in (1, 10, 128):
        oids, odists = search_oracle(small_ds, small_qs, k=k)
        ids, dists = eng.search(small_qs, k=k)
        assert ids.shape == (small_qs.m, k)
        np.testing.assert_allclose(
            np.sort(dists, 1), np.sort(odists, 1), atol=2e-3
        )


def test_sharded_grouped_dispatch(small_ds, small_qs, oracle_small):
    """G batches per dispatch: shard_map under an outer lax.scan."""
    eng = ShardedEngine(small_ds, db_tile=64, query_batch=8,
                        dispatch_group=4)
    oids, odists = oracle_small
    ids, dists = eng.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_bf16_fast_mode_recall():
    """bf16 storage: approximate fast mode — recall stays high, distances
    within bf16 rounding of the oracle's."""
    import jax.numpy as jnp

    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=80, categories=20)
    qs = generate_queries(32, seed=81, categories=20)
    eng = BatchedEngine(ds, db_tile=512, query_batch=32,
                        dtype=jnp.bfloat16, precision="default",
                        scan_impl="xla_packed")
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    from hvq_tpu.utils.compare import recall_at_k

    rec = recall_at_k(ids, oids, dists, odists, tolerance=50.0)
    assert rec >= 0.95, f"bf16 mode recall {rec}"
    # distances of reported ids reflect the rounded vectors: within ~1%
    true_d = ((ds.V[ids.astype(np.int64)] - qs.V[:, None, :]) ** 2).sum(-1)
    rel = np.abs(dists - true_d) / np.maximum(true_d, 1.0)
    assert rel.max() < 0.05


def test_sharded_sample_proportion(small_ds, small_qs):
    from hvq_tpu.models.oracle import search_oracle

    eng = ShardedEngine(small_ds, db_tile=64, query_batch=32)
    oids, odists = search_oracle(small_ds, small_qs, sample_proportion=0.53)
    ids, dists = eng.search(small_qs, sample_proportion=0.53)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)


def test_dispatch_plan():
    """Greedy power-of-two grouping: O(log) dispatches, O(log) shapes."""
    from hvq_tpu.models.batched import dispatch_plan

    assert dispatch_plan(10, 32) == [8, 2]
    assert dispatch_plan(40, 32) == [32, 8]
    assert dispatch_plan(7, 32) == [4, 2, 1]
    assert dispatch_plan(10, 0) == [10]      # whole-set single dispatch
    assert dispatch_plan(1, 8) == [1]
    assert dispatch_plan(0, 8) == []
    for nb in (1, 3, 10, 100, 1023):
        plan = dispatch_plan(nb, 32)
        assert sum(plan) == nb
        assert all(g & (g - 1) == 0 for g in plan)  # powers of two
        assert plan == sorted(plan, reverse=True)


def test_mass_ties_exactness():
    """500 IDENTICAL rows equal to the query: every engine must return k
    ties at distance 0 (any id subset of the duplicates is correct — the
    distance contract, not ids, is what's checked; compare_data.cpp:82-94
    rationale)."""
    import numpy as np

    from hvq_tpu.models.batched import BatchedEngine
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.models.sharded import ShardedEngine
    from hvq_tpu.utils.formats import Dataset
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds0 = generate_dataset(16384, seed=71, categories=10)
    qs = generate_queries(8, seed=72, categories=10, types=(0,))
    V = ds0.V.copy()
    V[2000:2500] = qs.V[0][None, :]          # 500 exact duplicates
    ds = Dataset(C=ds0.C, T=ds0.T, V=V.astype(np.float32))
    oids, odists = search_oracle(ds, qs)
    assert (odists[0] == 0).all()

    for make in (
        lambda: BatchedEngine(ds, query_batch=8, scan_impl="xla_packed"),
        lambda: ShardedEngine(ds, db_tile=512, query_batch=8),
        lambda: PartitionedEngine(ds, query_batch=8),
    ):
        eng = make()
        ids, dists = eng.search(qs)
        assert (dists[0] == 0).all(), type(eng).__name__
        assert np.all((ids[0] >= 2000) & (ids[0] < 2500)), type(eng).__name__
        assert len(set(ids[0].tolist())) == 100, type(eng).__name__
        from conftest import assert_results_match

        assert_results_match(ds, qs, ids, dists, oids, odists)
