"""Floating-point accuracy study — the fp_inaccuracy_test.cpp analogue.

The reference demonstrates that SIMD lane-parallel summation diverges from
scalar summation by up to 0.0625 absolute on adversarial alternating-sign
vectors, justifying a distance-tolerance (not id) comparison contract
(src/fp_inaccuracy_test.cpp:77-98, report.docx "Floating-Point Inaccuracy",
tolerance 0.002 at src/compare_data.cpp:5).

Our two distance formulations have the same property:

* ``exact_distances`` (direct Σ(q−d)², fixed reduction tree) is the
  .dist-faithful quantity — it must track float64 ground truth far inside
  the 0.002 tolerance on adversarial inputs;
* the matmul expansion ``‖d‖² − 2·q·d`` suffers catastrophic cancellation
  for near-identical vectors — these tests MEASURE that error to confirm
  it's why the engines refine exactly instead of trusting the expansion.
"""

import jax.numpy as jnp
import numpy as np

from hvq_tpu.ops.distance import (
    exact_distances,
    pad_vectors_np,
    squared_norms,
    tile_scores,
)


def _adversarial_pair():
    """Alternating-sign large-magnitude vectors (reference's construction
    idea: maximize reassociation damage), plus a near-duplicate pair
    (maximize cancellation damage in the expansion)."""
    rng = np.random.default_rng(0)
    a = np.empty(100, np.float32)
    a[0::2] = 6.0
    a[1::2] = -6.0
    b = -a + rng.uniform(-0.01, 0.01, 100).astype(np.float32)
    return a, b


def test_direct_sum_tracks_float64():
    a, b = _adversarial_pair()
    qV = jnp.asarray(pad_vectors_np(a[None, :]))
    rows = jnp.asarray(pad_vectors_np(b[None, :]))[None]
    got = float(exact_distances(qV, rows)[0, 0])
    want = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).sum())
    assert abs(got - want) < 2e-3 * max(1.0, want / 1000), (
        f"direct sum error {abs(got - want)} vs f64 {want}"
    )
    # and well inside the contract tolerance relative to magnitude
    assert abs(got - want) / want < 1e-5


def test_expansion_cancellation_measured():
    """Near-duplicate vectors: the expansion loses precision (why refine)."""
    rng = np.random.default_rng(1)
    base = rng.uniform(-6, 6, 100).astype(np.float32)
    near = base + rng.uniform(-1e-3, 1e-3, 100).astype(np.float32)
    qV = jnp.asarray(pad_vectors_np(base[None, :]))
    Vt = jnp.asarray(pad_vectors_np(near[None, :]))
    dn = squared_norms(Vt)
    score = float(tile_scores(qV, Vt, dn)[0, 0])  # ‖d‖² − 2qd (no ‖q‖²)
    qnorm = float((base.astype(np.float64) ** 2).sum())
    expansion_dist = score + qnorm
    true_dist = float(((base - near).astype(np.float64) ** 2).sum())
    direct = float(
        exact_distances(qV, Vt[None])[0, 0]
    )
    # The expansion's absolute error dwarfs the direct sum's.
    assert abs(direct - true_dist) < 1e-6
    assert abs(expansion_dist - true_dist) > 10 * abs(direct - true_dist)


def test_selection_robust_to_expansion_error():
    """End-to-end: expansion error never leaks into final distances,
    because candidates are re-refined exactly (the design's whole point)."""
    from hvq_tpu.models.batched import BatchedEngine
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.utils.formats import Dataset, QuerySet

    rng = np.random.default_rng(2)
    base = rng.uniform(-6, 6, (512, 100)).astype(np.float32)
    # plant clusters of near-duplicates: worst case for the expansion
    V = np.concatenate([base + rng.normal(0, 1e-3, base.shape).astype(np.float32)
                        for _ in range(4)])
    n = V.shape[0]
    ds = Dataset(C=np.zeros(n, np.float32), T=np.zeros(n, np.float32), V=V)
    qs = QuerySet(
        qtype=np.zeros(8, np.int32),
        v=np.full(8, -1, np.float32),
        l=np.full(8, -1, np.float32),
        r=np.full(8, -1, np.float32),
        V=V[:8] + rng.normal(0, 1e-4, (8, 100)).astype(np.float32),
    )
    eng = BatchedEngine(ds, db_tile=256, query_batch=8, scan_impl="xla")
    ids, dists = eng.search(qs)
    oids, odists = search_oracle(ds, qs)
    assert np.abs(dists - odists).max() < 2e-3
