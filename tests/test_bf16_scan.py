"""Certified bf16 scan-plane mode (``scan_store="bf16"``).

The selection matmul reads a rounded bf16 copy of the database (one true
MXU pass, half the scan bytes) while refinement gathers exact fp32 rows.
Unlike the old bf16 fast mode (``dtype=bfloat16``, approximate by design),
this mode keeps ``certified=True``: the certificate slack widens to the
bf16 rounding envelope (``_CERT_REL_MM_BF16``, models/batched.py) and k'
defaults wider (256), so every result is still oracle-exact — the mode
changes only WHICH candidates reach the fp32 refinement, never what is
reported. The reference has no analogue (its AVX2 kernel is fp32-only,
include/optimized_impl.h:54-170); the capability parallel is the
selection/refinement split that already tolerates the packed-key
quantization (DESIGN.md §2).
"""

import jax.numpy as jnp
import numpy as np

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.formats import Dataset, QuerySet
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match
from test_certificate import _adversarial_pair


def test_bf16_scan_mode_wiring():
    ds = generate_dataset(4096, seed=40, categories=20)
    eng = BatchedEngine(ds, query_batch=8, scan_impl="xla_packed",
                        scan_store="bf16")
    assert eng.certified, "bf16 scan plane must stay certified"
    assert eng.kprime == 240, "k' must default wider under the bf16 slack"
    assert eng.db.V_scan is not None and eng.db.V_scan.dtype == jnp.bfloat16
    assert eng.db.Vp.dtype == jnp.float32, "refine table stays fp32"
    # the slack actually widened
    from hvq_tpu.models.batched import _CERT_REL_MM, _CERT_REL_MM_BF16

    assert eng._rel_mm == _CERT_REL_MM_BF16 > _CERT_REL_MM


def test_bf16_scan_exact_on_reference_distribution():
    ds = generate_dataset(16384, seed=41, categories=20)
    qs = generate_queries(64, seed=42, categories=20)   # all 4 types
    eng = BatchedEngine(ds, query_batch=64, scan_impl="xla_packed",
                        scan_store="bf16")
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_bf16_scan_adversarial_bin_concentration():
    """The hot-bin layout that defeats the uncertified packed scan must
    stay exact in bf16 mode too — repair + ladder run against the widened
    threshold, and the terminal exact rerun reads the fp32 plane."""
    ds, qs, hot_pos = _adversarial_pair()
    eng = BatchedEngine(ds, query_batch=8, scan_impl="xla_packed",
                        scan_store="bf16")
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    assert set(hot_pos[:16].tolist()) <= set(ids[0][:32].tolist())


def test_bf16_scan_slack_boundary_stress():
    """Scale sweep at the certificate boundary (mirrors
    test_certificate_slack_boundary_stress): large norms maximize the
    absolute selection error (rel_mm·(‖q‖²+max‖d‖²) is ~500× wider here),
    near-tied sphere rows at the k-th boundary make any sub-slack loss
    visible. The bf16 selection may scramble the sphere rows' order, but
    all of them sit far below every background row, so the k'=256 cut must
    keep them and fp32 refinement must sort them exactly."""
    for scale in (1.0, 64.0, 4096.0):
        ds = generate_dataset(16384, seed=43, categories=20)
        qs = generate_queries(8, seed=44, categories=20, types=(0,))
        rng = np.random.default_rng(45)
        V = (ds.V * scale).astype(np.float32)
        qV = (qs.V * scale).astype(np.float32)
        dirs = rng.standard_normal((64, V.shape[1])).astype(np.float64)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radius = 0.1 * scale * (1.0 + 1e-7 * rng.standard_normal((64, 1)))
        V[:64] = (qV[0].astype(np.float64) + radius * dirs).astype(np.float32)
        ds = Dataset(C=ds.C, T=ds.T, V=V)
        qs = QuerySet(qtype=qs.qtype, v=qs.v, l=qs.l, r=qs.r, V=qV)
        eng = BatchedEngine(ds, query_batch=8, scan_impl="xla_packed",
                            scan_store="bf16")
        oids, odists = search_oracle(ds, qs)
        ids, dists = eng.search(qs)
        assert set(ids[0][:64].tolist()) == set(range(64)), scale
        tol = max(0.002, 1e-5 * float(odists.max()))
        assert (
            recall_at_k(ids, oids, dists, odists, tolerance=tol) == 1.0
        ), scale


def test_bf16_scan_reported_distances_are_fp32_exact():
    """The refine table is fp32, so reported distances must be bit-identical
    to the fp32-storage engine's on the same data — the bf16 plane may only
    change candidate SELECTION (covered by certificate + wider k')."""
    ds = generate_dataset(8192, seed=46, categories=20)
    qs = generate_queries(32, seed=47, categories=20)
    kw = dict(query_batch=32, scan_impl="xla_packed")
    eng32 = BatchedEngine(ds, **kw)
    eng16 = BatchedEngine(ds, scan_store="bf16", **kw)
    ids32, d32 = eng32.search(qs)
    ids16, d16 = eng16.search(qs)
    np.testing.assert_array_equal(d32, d16)


def test_partitioned_bf16_plane_matches_oracle():
    """PartitionedEngine with the certified bf16 scan plane: the dense
    path's selection reads the half-width copy, refinement + routed path
    keep fp32, results stay oracle-exact (VERDICT r3 #2 wiring)."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.utils.compare import recall_at_k
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    from conftest import assert_results_match

    ds = generate_dataset(20000, seed=60, categories=25)
    qs = generate_queries(64, seed=61, categories=25)
    eng = PartitionedEngine(
        ds, db_tile=1024, query_batch=32, scan_store="bf16",
        route_buckets=(1024, 4096),
    )
    assert eng._bf16_scan and eng.kprime == 240 and eng.certified
    assert eng.index.cat_view.V_scan is not None
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_partitioned_sharded_bf16_plane_matches_oracle():
    """Sharded flagship with the bf16 plane: the plane shards over "d"
    beside the fp32 view; per-shard scans read it, refinement stays fp32."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.partitioned_sharded import ShardedPartitionedEngine
    from hvq_tpu.utils.compare import recall_at_k
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    from conftest import assert_results_match

    ds = generate_dataset(8192, seed=62, categories=20)
    qs = generate_queries(32, seed=63, categories=20)
    eng = ShardedPartitionedEngine(
        ds, db_tile=256, query_batch=32, scan_store="bf16",
        route_buckets=(256,),
    )
    assert eng._bf16_scan and eng.kprime == 240
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
