"""IVF approximate mode: recall@100 gate vs the exact oracle."""

import numpy as np
import pytest

from hvq_tpu.models.ivf import IVFEngine
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries


@pytest.fixture(scope="module")
def clustered():
    """Clustered data + in-distribution queries (the regime ANN is for)."""
    ds = generate_dataset(
        20_000, seed=3, categories=8, clusters=64, cluster_std=1.0
    )
    qs = generate_queries(
        64, seed=4, categories=8, clusters=64, centers_seed=3
    )
    return ds, qs


def test_ivf_recall_gate(clustered):
    ds, qs = clustered
    eng = IVFEngine(ds, cap=256, nprobe=8, query_batch=64,
                    kmeans_iters=6, seed=0)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    rec = recall_at_k(ids, oids, dists, odists)
    assert rec >= 0.99, f"IVF recall {rec} < 0.99 gate (BASELINE.json)"


def test_ivf_results_are_true_distances(clustered):
    """Reported distances must be true distances of the reported ids."""
    ds, qs = clustered
    eng = IVFEngine(ds, cap=256, nprobe=4, query_batch=64, kmeans_iters=4)
    ids, dists = eng.search(qs)
    gathered = ds.V[ids.astype(np.int64)]
    true_d = ((gathered - qs.V[:, None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(dists, true_d, atol=2e-3)
    # ascending order per query
    assert np.all(np.diff(dists, axis=1) >= -1e-6)


def test_ivf_filtered_probes(clustered):
    """Filtered types keep recall via the probe boost."""
    ds, _ = clustered
    qs = generate_queries(48, seed=9, categories=8, clusters=64,
                          centers_seed=3, types=(1, 2, 3))
    eng = IVFEngine(ds, cap=256, nprobe=8, query_batch=48, kmeans_iters=6)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    rec = recall_at_k(ids, oids, dists, odists)
    assert rec >= 0.99, f"filtered IVF recall {rec} < 0.99"


def test_ivf_padding_path():
    """Nearly-empty predicate: tail padding must match reference semantics."""
    from hvq_tpu.utils.formats import QuerySet

    ds = generate_dataset(2_000, seed=5, categories=600, clusters=16)
    qs = QuerySet(
        qtype=np.array([1], np.int32),
        v=np.array([0.987654], np.float32),  # matches nothing
        l=np.array([-1], np.float32),
        r=np.array([-1], np.float32),
        V=np.zeros((1, 100), np.float32),
    )
    eng = IVFEngine(ds, cap=128, nprobe=4, query_batch=8, kmeans_iters=3)
    ids, dists = eng.search(qs)
    assert set(ids[0]) == set(range(1900, 2000))
    assert np.all(np.diff(dists[0]) >= -1e-6)


def test_ivf_sample_proportion(clustered):
    """sn masks original file order; recall holds on the surviving prefix."""
    ds, qs = clustered
    eng = IVFEngine(ds, cap=256, nprobe=8, query_batch=64, kmeans_iters=4)
    oids, odists = search_oracle(ds, qs, sample_proportion=0.7)
    ids, dists = eng.search(qs, sample_proportion=0.7)
    rec = recall_at_k(ids, oids, dists, odists)
    assert rec >= 0.98, f"IVF sp recall {rec}"


def test_ivf_flat_union_path(clustered):
    """The flat union path (carry-free slab scan + one top-k) must match
    the streaming-merge path's results and actually be selected for
    small-batch unions."""
    ds, qs = clustered
    kw = dict(cap=256, nprobe=8, query_batch=16, kmeans_iters=6, seed=0)
    eng_flat = IVFEngine(ds, **kw)                      # default budget: flat
    eng_merge = IVFEngine(ds, flat_budget_bytes=0, **kw)  # forced streaming

    calls = []
    orig = eng_flat._union_flat_jit

    def spy(*a, **k2):
        calls.append(1)
        return orig(*a, **k2)

    eng_flat._union_flat_jit = spy
    sub = type(qs)(qtype=qs.qtype[:16], v=qs.v[:16], l=qs.l[:16],
                   r=qs.r[:16], V=qs.V[:16])
    ids_f, d_f = eng_flat.search(sub)
    ids_m, d_m = eng_merge.search(sub)
    assert calls, "flat path should have been selected at B=16"
    np.testing.assert_allclose(d_f, d_m, atol=2e-3)
    oids, odists = search_oracle(ds, sub)
    assert recall_at_k(ids_f, oids, d_f, odists) >= 0.99
