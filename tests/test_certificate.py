"""Exactness-certificate tests for the deferred bin-reduce scan.

The packed scan keeps the best R per 128-lane bin; a bin holding more than
R of a query's true top-k' would silently lose candidates on the legacy
(Poisson-bound-only) path. The certificate (models/batched.py docstring)
detects exactly that on device and re-runs the batch through the streaming
``lax.top_k`` path — so adversarial, bin-concentrated layouts stay exact.
This is the failure mode the reference never had (its Knn streams every
candidate, include/optimized_impl.h:284-335) and a pure Poisson analysis
can't exclude.
"""

import numpy as np
import pytest

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.formats import Dataset
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


def _adversarial_pair(n=16384, hot=32, seed=3, db_tile=8192):
    """Dataset whose ``hot`` nearest rows for query 0 all share one bin.

    The hot rows are tiny perturbations of the query vector placed at the
    positions of ONE bin of the default "axis1" scan layout — tile 0's
    strided group {0, bins, 2·bins, …} with bins = db_tile/128
    (ops.pallas_scan.deferred_packed_scan_xla). With hot > R the bin
    reduce MUST lose some of them — only the certificate saves the
    result. Returns (ds, qs, hot_positions).
    """
    ds = generate_dataset(n, seed=seed, categories=20)
    qs = generate_queries(8, seed=seed + 1, categories=20, types=(0,))
    rng = np.random.default_rng(seed + 2)
    V = ds.V.copy()
    bins = db_tile // 128
    assert hot <= 128 and hot * bins <= min(n, db_tile)
    pos = np.arange(hot) * bins          # slice j of bin 0, tile 0
    V[pos] = qs.V[0][None, :] + 1e-3 * rng.standard_normal((hot, V.shape[1]))
    return Dataset(C=ds.C, T=ds.T, V=V.astype(np.float32)), qs, pos


def test_adversarial_bin_concentration_triggers_fallback():
    # repair_bins=0: a single hot bin is silently fixed by the in-program
    # repair (tests/test_repair.py) — this test pins the LADDER path
    ds, qs, hot_pos = _adversarial_pair()
    eng = BatchedEngine(
        ds, query_batch=8, scan_impl="xla_packed", repair_bins=0
    )
    assert eng.certified and eng.bin_top < 32

    calls = []
    orig = eng._rerun_suspects

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    eng._rerun_suspects = spy
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert calls, "certificate should have flagged the concentrated bin"
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    # the concentrated rows really are the query's nearest neighbors
    assert set(hot_pos[:16].tolist()) <= set(ids[0][:32].tolist())


def test_uncertified_packed_scan_loses_the_concentrated_bin():
    """Sanity that the adversarial layout is genuinely adversarial: with the
    certificate disabled (and the Poisson gate bypassed by keeping the
    certified R), recall for the concentrated query drops below 1."""
    from hvq_tpu.ops.pallas_scan import choose_bin_top

    ds, qs, _ = _adversarial_pair()
    # keep the certified-mode R but drop the certificate (constructor-only:
    # both are baked into the jitted program)
    r_cert = choose_bin_top(16384, 128, certified=True)
    eng = BatchedEngine(
        ds, query_batch=8, scan_impl="xla_packed",
        certified=False, bin_top=r_cert,
    )
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    rec = recall_at_k(ids[:1], oids[:1], dists[:1], odists[:1])
    assert rec < 1.0


def test_sharded_adversarial_bin_concentration_triggers_fallback():
    """Distributed certificate: the per-shard saturation minima are
    pmin-reduced over the "d" mesh axis, so a concentration inside ONE
    shard's bins must still flag the whole sharded scan."""
    from hvq_tpu.models.sharded import ShardedEngine

    ds, qs, _ = _adversarial_pair(db_tile=512)
    eng = ShardedEngine(
        ds, db_tile=512, query_batch=8, scan_impl="xla_packed",
        repair_bins=0,  # pin the ladder path (repair: tests/test_repair.py)
    )
    assert eng.certified and eng.bin_top < 32

    calls = []
    orig = eng._rerun_suspects

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    eng._rerun_suspects = spy
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert calls, "sharded certificate should have flagged the hot bin"
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_cert_terms_histogram_matches_batched_vs_sharded(monkeypatch):
    """HVQ_CERT_TERMS forensics parity across the mesh: the sharded engine
    pmin-reduces each certificate term separately, so the per-query term
    bitmask histogram on an adversarial layout must match the single-chip
    batched engine's (the diagnostic that drove the round-2 repair win
    must be producible for the multi-chip path too). Same db_tile keeps
    the 128-lane bin structure identical (shard slabs are tile-aligned)."""
    from hvq_tpu.models.sharded import ShardedEngine

    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    ds, qs, _ = _adversarial_pair(db_tile=512)
    kw = dict(db_tile=512, query_batch=8, scan_impl="xla_packed",
              repair_bins=0)
    eng_b = BatchedEngine(ds, **kw)
    eng_s = ShardedEngine(ds, **kw)
    oids, odists = search_oracle(ds, qs)
    for eng in (eng_b, eng_s):
        ids, dists = eng.search(qs)
        assert recall_at_k(ids, oids, dists, odists) == 1.0
        assert eng._last_cert_terms is not None
    # the hot-bin query must flag the BIN term (bit 1) on both engines
    assert eng_b._last_cert_terms[0] & 1
    assert eng_s._last_cert_terms[0] & 1
    hist_b = np.bincount(eng_b._last_cert_terms, minlength=8)
    hist_s = np.bincount(eng_s._last_cert_terms, minlength=8)
    assert hist_b.tolist() == hist_s.tolist()


def test_escalation_ladder_deeper_pass_suffices():
    """With bin_top forced to 3 on a random layout (bins·P(X≥3) ≈ 0.6 per
    query), bins saturate and the certificate fires, but the 2R rerun
    (step 1 of the ladder) must already be exact — the streaming path
    (step 2) never compiles (bins·P(X≥6) ≈ 4e-5)."""
    ds = generate_dataset(65536, seed=21, categories=20)
    qs = generate_queries(32, seed=22, categories=20)
    eng = BatchedEngine(
        ds, query_batch=32, scan_impl="xla_packed", bin_top=3,
        repair_bins=0,  # pin the ladder path (repair: tests/test_repair.py)
    )

    impls = []
    orig = eng._search_jit

    def spy(*a, **kw):
        impls.append(kw.get("impl"))
        return orig(*a, **kw)

    eng._search_jit = spy
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    assert "xla_packed" in impls, "deeper rerun should have run"
    assert "xla" not in impls, "streaming fallback should not be needed"


def test_partitioned_full_path_certificate():
    """PartitionedEngine's wide-query dense path carries the same
    certificate. Adversarial layout IN VIEW ORDER: the hot rows share one
    category, so the category-sorted view packs them into adjacent bins;
    a type-0 query must flag and the ladder must restore exactness."""
    from hvq_tpu.models.partitioned import PartitionedEngine

    # Under the default axis1 layout, bins are STRIDED position groups, so
    # a contiguous hot block concentrates a bin only when it wraps every
    # bin > R times: hot = (R+1)·bins consecutive view rows (R=10 at this
    # n, bins = 8192/128 = 64 → 704 rows).
    n, hot = 16384, 704
    ds = generate_dataset(n, seed=5, categories=20)
    qs = generate_queries(8, seed=6, categories=20, types=(0,))
    rng = np.random.default_rng(7)
    V = ds.V.copy()
    C = ds.C.copy()
    V[:hot] = qs.V[0][None, :] + 1e-3 * rng.standard_normal((hot, V.shape[1]))
    # a category value no other row uses → the hot rows become their own
    # contiguous partition in the category-sorted view, wrapping every
    # strided bin of their tile (R+1)× — the concentration the bin reduce
    # must lose and the certificate must catch
    C[:hot] = C.max() + 1.0
    ds = Dataset(C=C, T=ds.T, V=V.astype(np.float32))

    eng = PartitionedEngine(ds, query_batch=8)
    assert eng.certified and eng.bin_top is not None and eng.bin_top < hot

    calls = []
    orig = eng._rerun_suspects

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    eng._rerun_suspects = spy
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert calls, "partitioned certificate should have flagged the hot bins"
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_level2_reduce_exact_with_certificate():
    """Force the 2nd-level candidate reduce: results must stay
    oracle-exact, including on filtered queries. bin_top=32 widens the
    stream past the axis1 gate (W = 128·32·4 = 16384 = bins2 ≥ 128) so
    level 2 genuinely runs; the spy asserts it did."""
    from hvq_tpu.ops import topk as topk_ops

    ds = generate_dataset(65536, seed=13, categories=20)
    qs = generate_queries(32, seed=14, categories=20)
    eng = BatchedEngine(
        ds, db_tile=512, query_batch=32, scan_impl="xla_packed",
        l2_min_w=1, bin_top=32,
    )
    assert ds.n // 512 >= 128

    calls = []
    orig = topk_ops.binned_stream_topk

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    topk_ops.binned_stream_topk = spy
    try:
        oids, odists = search_oracle(ds, qs)
        ids, dists = eng.search(qs)
    finally:
        topk_ops.binned_stream_topk = orig
    assert calls, "level-2 reduce should have traced"
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    assert_results_match(ds, qs, ids, dists, oids, odists)

    # adversarial: hot rows share level-1 bins; the certificate + ladder
    # must still restore exactness with level 2 active
    ds2, qs2, _ = _adversarial_pair(n=65536, db_tile=512)
    eng2 = BatchedEngine(
        ds2, db_tile=512, query_batch=8, scan_impl="xla_packed",
        l2_min_w=1, bin_top=32,
    )
    oids2, odists2 = search_oracle(ds2, qs2)
    ids2, dists2 = eng2.search(qs2)
    assert recall_at_k(ids2, oids2, dists2, odists2) == 1.0
    assert_results_match(ds2, qs2, ids2, dists2, oids2, odists2)


def test_level2_skipped_when_tiles_too_few():
    """nt < 128 must bypass level 2 even when forced wide-open: the
    transposed bins would aggregate the per-bin-best (round-0) entries of
    many level-1 bins and concentrate exactly the top candidates."""
    ds = generate_dataset(60_000, seed=61, categories=30)
    qs = generate_queries(64, seed=62, categories=30)
    eng = BatchedEngine(
        ds, db_tile=2048, query_batch=64, scan_impl="xla_deferred",
        certified=False,              # no safety net: must not lose
        l2_min_w=1,                   # nt = 30 → guard must refuse
    )
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_certificate_slack_boundary_stress():
    """Empirical sweep of the certificate's fp-slack boundary.

    Large-norm vectors maximize the absolute error the selection matmul can
    accumulate (the slack model's _CERT_REL_MM·(‖q‖²+max‖d‖²) term), and
    near-identical distances concentrated at the k-th boundary make any
    sub-slack selection error visible as a recall loss. At every scale the
    result must stay oracle-exact — either the fast path got it right or
    the certificate flagged and the ladder repaired it."""
    from hvq_tpu.utils.formats import QuerySet

    for scale in (1.0, 64.0, 4096.0):
        ds = generate_dataset(16384, seed=33, categories=20)
        qs = generate_queries(8, seed=34, categories=20, types=(0,))
        rng = np.random.default_rng(35)
        V = (ds.V * scale).astype(np.float32)
        qV = (qs.V * scale).astype(np.float32)
        # 64 rows on a near-exact sphere around query 0: ties at the k-th
        # distance within ~1e-7 relative — far inside the slack band.
        dirs = rng.standard_normal((64, V.shape[1])).astype(np.float64)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        radius = 0.1 * scale * (1.0 + 1e-7 * rng.standard_normal((64, 1)))
        V[:64] = (qV[0].astype(np.float64) + radius * dirs).astype(np.float32)
        ds = Dataset(C=ds.C, T=ds.T, V=V)
        qs = QuerySet(qtype=qs.qtype, v=qs.v, l=qs.l, r=qs.r, V=qV)
        eng = BatchedEngine(ds, query_batch=8, scan_impl="xla_packed")
        oids, odists = search_oracle(ds, qs)
        ids, dists = eng.search(qs)
        # The 0.002 absolute tolerance is calibrated for unit-scale data;
        # at scale s the fp32 ulp of a distance itself exceeds it, so the
        # contract here is relative: a *selection* miss confuses a sphere
        # row (d ≈ (0.1s)²) with a random row (d ≈ ‖q‖²+‖d‖²) — an error
        # ~1e4× any fp noise. Query 0's top-64 must be exactly the sphere.
        assert set(ids[0][:64].tolist()) == set(range(64)), scale
        tol = max(0.002, 1e-5 * float(odists.max()))
        assert (
            recall_at_k(ids, oids, dists, odists, tolerance=tol) == 1.0
        ), scale


def test_random_layout_rarely_falls_back():
    """On reference-distribution (uniform) data the certificate should pass
    without a rerun: the fast path's throughput is preserved."""
    ds = generate_dataset(16384, seed=9, categories=20)
    qs = generate_queries(64, seed=10, categories=20)
    eng = BatchedEngine(ds, query_batch=64, scan_impl="xla_packed")

    def boom(*a, **kw):  # pragma: no cover - should never run
        raise AssertionError("unexpected certificate fallback")

    eng._rerun_suspects = boom
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
