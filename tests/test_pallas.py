"""Pallas fused-scan kernel: differential vs its jnp mirror + engine E2E."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvq_tpu.models.batched import BatchedEngine
from hvq_tpu.ops.pallas_scan import fused_bin_scan, fused_bin_scan_reference
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


def _rand_problem(n_pad=1024, B=16, seed=0):
    rng = np.random.default_rng(seed)
    Vp = rng.standard_normal((n_pad, 128)).astype(np.float32)
    C = rng.integers(0, 5, n_pad).astype(np.float32)
    T = rng.uniform(-3, 3, n_pad).astype(np.float32)
    dn = (Vp * Vp).sum(1).astype(np.float32)
    oid = np.arange(n_pad, dtype=np.int32)
    qV = rng.standard_normal((B, 128)).astype(np.float32)
    ac = rng.random(B) < 0.5
    at = rng.random(B) < 0.5
    v = rng.integers(0, 5, B).astype(np.float32)
    l = rng.uniform(-3, 0, B).astype(np.float32)
    r = rng.uniform(0, 3, B).astype(np.float32)
    return [jnp.asarray(x) for x in (Vp, C, T, dn, oid, qV, ac, v, at, l, r)]


@pytest.mark.parametrize("db_tile", [128, 256, 512])
def test_kernel_matches_reference(db_tile):
    args = _rand_problem()
    sn = jnp.int32(900)
    s1, i1 = fused_bin_scan(*args, sn, db_tile=db_tile, interpret=True)
    s2, i2 = fused_bin_scan_reference(*args, sn, db_tile=db_tile)
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s2), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_kernel_respects_sn():
    """sn masks rows by reported id — nothing >= sn may surface."""
    args = _rand_problem(seed=3)
    s, i = fused_bin_scan(*args, jnp.int32(100), db_tile=256, interpret=True)
    live = np.isfinite(np.asarray(s))
    assert np.all(np.asarray(i)[live] < 100)
    assert live.any()


def test_choose_bin_top():
    from hvq_tpu.ops.pallas_scan import choose_bin_top

    assert choose_bin_top(2048) is None           # too small: no sound R
    assert choose_bin_top(32 * 1024) == 8         # moderate: deep bins
    assert choose_bin_top(1 << 20) in (2, 3)      # large: shallow bins fine
    assert choose_bin_top(16 << 20) == 2


def test_pallas_engine_matches_oracle():
    """Full pallas path vs oracle at a size where bin loss is ~1e-9."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=30, categories=20)
    qs = generate_queries(32, seed=33, categories=20)
    eng = BatchedEngine(ds, db_tile=512, query_batch=32, scan_impl="pallas")
    # kernel_bin_top rounds 8 up to 32 so out_w = 32·4 = 128 (Mosaic block)
    assert eng.scan_impl == "pallas" and eng.interpret and eng.bin_top == 32
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_pallas_engine_padding_and_sample():
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=31, categories=2000)
    qs = generate_queries(8, seed=32, categories=2000, types=(1, 3))
    eng = BatchedEngine(ds, db_tile=256, query_batch=8, scan_impl="pallas")
    assert eng.scan_impl == "pallas"
    oids, odists = search_oracle(ds, qs, sample_proportion=0.6)
    ids, dists = eng.search(qs, sample_proportion=0.6)
    assert_results_match(ds, qs, ids, dists, oids, odists)


def test_small_db_keeps_fast_path_when_certified(small_ds, small_qs):
    """Small DBs no longer force the slow path: the exactness certificate
    (BatchedEngine docstring) makes the bin reduce safe at any size, with a
    deeper R to keep the fallback rate tiny."""
    eng = BatchedEngine(small_ds, db_tile=256, query_batch=8,
                        scan_impl="pallas")
    assert eng.scan_impl == "pallas" and eng.certified
    assert eng.bin_top * (small_ds.n // 128 + 1) >= 256  # ≥ 2·k' candidates

    from hvq_tpu.models.oracle import search_oracle

    oids, odists = search_oracle(small_ds, small_qs)
    ids, dists = eng.search(small_qs)
    assert_results_match(small_ds, small_qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_small_db_falls_back_without_certificate(small_ds):
    """certified=False restores the legacy Poisson-soundness gate: no sound
    bin depth at 2k rows → the exact lax.top_k streaming path."""
    eng = BatchedEngine(small_ds, db_tile=256, query_batch=8,
                        scan_impl="pallas", certified=False)
    assert eng.scan_impl == "xla"


def test_xla_deferred_matches_oracle():
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=50, categories=20)
    qs = generate_queries(16, seed=51, categories=20)
    eng = BatchedEngine(ds, db_tile=512, query_batch=16,
                        scan_impl="xla_deferred")
    assert eng.scan_impl == "xla_deferred"
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_packed_scan_selection_matches_reference():
    """Packed-key scan selects the same candidates as the plain deferred
    scan (top-k sets agree; distances agree to the 7-low-bit quantization)."""
    import jax
    import jax.numpy as jnp
    from hvq_tpu.ops.pallas_scan import (
        deferred_bin_scan_xla,
        deferred_packed_scan_xla,
    )

    rng = np.random.default_rng(7)
    n_pad, B, Dt = 4096, 8, 512
    Vp = rng.standard_normal((n_pad, 128)).astype(np.float32)
    C = rng.integers(0, 4, n_pad).astype(np.float32)
    T = rng.uniform(-3, 3, n_pad).astype(np.float32)
    dn = (Vp * Vp).sum(1).astype(np.float32)
    oid = np.arange(n_pad, dtype=np.int32)
    qV = rng.standard_normal((B, 128)).astype(np.float32)
    ac = rng.random(B) < 0.5
    at = rng.random(B) < 0.5
    v = rng.integers(0, 4, B).astype(np.float32)
    l = rng.uniform(-3, 0, B).astype(np.float32)
    r = rng.uniform(0, 3, B).astype(np.float32)
    args = [jnp.asarray(x) for x in (Vp, C, T, dn, oid, qV, ac, v, at, l, r)]
    sn = jnp.int32(4000)

    s_ref, i_ref = deferred_bin_scan_xla(*args, sn, db_tile=Dt, bin_top=2)
    s_pk, i_pk = deferred_packed_scan_xla(*args, sn, db_tile=Dt, bin_top=2)

    for b in range(B):
        # same top-32 candidate sets per query
        ref_top = np.asarray(i_ref)[b][np.argsort(np.asarray(s_ref)[b])[:32]]
        pk_top = np.asarray(i_pk)[b][np.argsort(np.asarray(s_pk)[b])[:32]]
        assert set(ref_top.tolist()) == set(pk_top.tolist())
        # both variants emit full squared distances (qnorm-shifted);
        # packed quantizes 7 low mantissa bits
        fin = np.isfinite(np.asarray(s_pk)[b])
        approx = np.asarray(s_pk)[b][fin]
        exact = np.asarray(s_ref)[b][np.isfinite(np.asarray(s_ref)[b])]
        # match by sorted order
        np.testing.assert_allclose(
            np.sort(approx), np.sort(exact), rtol=2e-5, atol=1e-3
        )


def test_fused_packed_kernel_matches_xla_packed():
    """The Pallas packed kernel (interpret mode) is column-for-column
    identical to its XLA expression — same packed keys, same layout."""
    from hvq_tpu.ops.pallas_scan import (
        deferred_packed_scan_xla,
        fused_packed_scan,
        kernel_bin_top,
    )

    rng = np.random.default_rng(11)
    n_pad, B, Dt = 32768, 8, 512
    R = kernel_bin_top(Dt, n_pad)   # choose_bin_top 8 → rounded up to 32
    assert R == 32 and (R * (Dt // 128)) % 128 == 0
    Vp = rng.standard_normal((n_pad, 128)).astype(np.float32)
    C = rng.integers(0, 4, n_pad).astype(np.float32)
    T = rng.uniform(-3, 3, n_pad).astype(np.float32)
    dn = (Vp * Vp).sum(1).astype(np.float32)
    oid = np.arange(n_pad, dtype=np.int32)
    qV = rng.standard_normal((B, 128)).astype(np.float32)
    ac = rng.random(B) < 0.5
    at = rng.random(B) < 0.5
    v = rng.integers(0, 4, B).astype(np.float32)
    l = rng.uniform(-3, 0, B).astype(np.float32)
    r = rng.uniform(0, 3, B).astype(np.float32)
    args = [jnp.asarray(x) for x in (Vp, C, T, dn, oid, qV, ac, v, at, l, r)]
    sn = jnp.int32(4000)

    s_pl, i_pl = fused_packed_scan(
        *args, sn, db_tile=Dt, bin_top=R, interpret=True
    )
    s_x, i_x = deferred_packed_scan_xla(*args, sn, db_tile=Dt, bin_top=R)
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_x), rtol=1e-6, atol=1e-4
    )
    # ids must agree wherever the (quantized) distances are distinct
    same = np.isclose(np.asarray(s_pl), np.asarray(s_x))
    np.testing.assert_array_equal(
        np.asarray(i_pl)[same & np.isfinite(np.asarray(s_pl))],
        np.asarray(i_x)[same & np.isfinite(np.asarray(s_x))],
    )


def test_packed_engine_matches_oracle():
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=70, categories=20)
    qs = generate_queries(24, seed=71, categories=20)
    eng = BatchedEngine(ds, db_tile=512, query_batch=24,
                        scan_impl="xla_packed")
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_fused_packed_kernel_v3_matches_xla_axis1():
    """v3 (interpret) vs the XLA axis1 expression: same candidate sets and
    positions; distances agree to the 3-pass-bf16 selection tolerance (the
    kernel's manual hi/lo matmul vs XLA Precision.HIGHEST)."""
    from hvq_tpu.ops.pallas_scan import (
        deferred_packed_scan_xla,
        fused_packed_scan_v3,
    )

    rng = np.random.default_rng(13)
    n_pad, B, Dt = 4096, 8, 1024
    Vp = rng.standard_normal((n_pad, 128)).astype(np.float32)
    C = rng.integers(0, 4, n_pad).astype(np.float32)
    T = rng.uniform(-3, 3, n_pad).astype(np.float32)
    dn = (Vp * Vp).sum(1).astype(np.float32)
    oid = np.arange(n_pad, dtype=np.int32)
    qV = rng.standard_normal((B, 128)).astype(np.float32)
    ac = rng.random(B) < 0.5
    at = rng.random(B) < 0.5
    v = rng.integers(0, 4, B).astype(np.float32)
    l = rng.uniform(-3, 0, B).astype(np.float32)
    r = rng.uniform(0, 3, B).astype(np.float32)
    args = [jnp.asarray(x) for x in (Vp, C, T, dn, oid, qV, ac, v, at, l, r)]
    sn = jnp.int32(4000)

    s3, i3 = fused_packed_scan_v3(
        *args, sn, db_tile=Dt, bin_top=2, interpret=True
    )
    s_x, i_x = deferred_packed_scan_xla(
        *args, sn, db_tile=Dt, bin_top=2, layout="axis1"
    )
    assert s3.shape == s_x.shape
    for b in range(B):
        top3 = np.asarray(i3)[b][np.argsort(np.asarray(s3)[b])[:32]]
        topx = np.asarray(i_x)[b][np.argsort(np.asarray(s_x)[b])[:32]]
        assert set(top3.tolist()) == set(topx.tolist())
    fin = np.isfinite(np.asarray(s_x))
    np.testing.assert_allclose(
        np.asarray(s3)[fin], np.asarray(s_x)[fin], rtol=3e-6, atol=2e-3
    )


def test_v3_engine_matches_oracle():
    """Full pallas_v3 path (interpret) incl. in-program repair + certificate:
    results oracle-exact, layout forced to axis1, db_tile defaults 16384."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=80, categories=20)
    qs = generate_queries(16, seed=81, categories=20)
    eng = BatchedEngine(ds, query_batch=16, scan_impl="pallas_v3")
    assert eng.db.db_tile == 16384 and eng.scan_layout == "axis1"
    assert eng.certified
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_v3_engine_bf16_plane_matches_oracle():
    """pallas_v3 over the bf16 scan plane (single-pass matmul): certified,
    oracle-exact via the widened slack + fp32 refinement."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(32768, seed=82, categories=20)
    qs = generate_queries(16, seed=83, categories=20)
    eng = BatchedEngine(ds, query_batch=16, scan_impl="pallas_v3",
                        scan_store="bf16")
    assert eng.certified and eng.kprime == 240
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_fused_packed_kernel_v3_window_matches_xla_window():
    """v3's dynamic row0/ntw window (scalar-prefetch index maps) vs the XLA
    windowed twin: identical candidate multisets and GLOBAL positions."""
    from hvq_tpu.ops.pallas_scan import (
        deferred_packed_scan_xla,
        fused_packed_scan_v3,
    )

    rng = np.random.default_rng(21)
    n_pad, B, Dt, ntw = 8192, 8, 1024, 3
    Vp = rng.standard_normal((n_pad, 128)).astype(np.float32)
    C = rng.integers(0, 4, n_pad).astype(np.float32)
    T = rng.uniform(-3, 3, n_pad).astype(np.float32)
    dn = (Vp * Vp).sum(1).astype(np.float32)
    oid = np.arange(n_pad, dtype=np.int32)
    qV = rng.standard_normal((B, 128)).astype(np.float32)
    ac = rng.random(B) < 0.5
    at = rng.random(B) < 0.5
    v = rng.integers(0, 4, B).astype(np.float32)
    l = rng.uniform(-3, 0, B).astype(np.float32)
    r = rng.uniform(0, 3, B).astype(np.float32)
    args = [jnp.asarray(x) for x in (Vp, C, T, dn, oid, qV, ac, v, at, l, r)]
    sn = jnp.int32(8000)

    for row0 in (0, 2 * Dt, 5 * Dt):
        s3, i3 = fused_packed_scan_v3(
            *args, sn, db_tile=Dt, bin_top=2, interpret=True,
            row0=jnp.int32(row0), ntw=ntw,
        )
        s_x, i_x = deferred_packed_scan_xla(
            *args, sn, db_tile=Dt, bin_top=2, layout="axis1",
            row0=jnp.int32(row0), ntw=ntw,
        )
        assert s3.shape == s_x.shape == (B, ntw * 2 * (Dt // 128))
        # positions must be GLOBAL (inside [row0, row0 + ntw*Dt))
        fin = np.isfinite(np.asarray(s3))
        p3 = np.asarray(i3)[fin]
        assert p3.min() >= row0 and p3.max() < row0 + ntw * Dt
        for b in range(B):
            top3 = np.asarray(i3)[b][np.argsort(np.asarray(s3)[b])[:16]]
            topx = np.asarray(i_x)[b][np.argsort(np.asarray(s_x)[b])[:16]]
            assert set(top3.tolist()) == set(topx.tolist()), row0


def test_partitioned_v3_window_path_matches_oracle():
    """PartitionedEngine wide-type-2 WINDOW path on the v3 kernel
    (interpret): windowed dispatches actually engage and results stay
    oracle-exact."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.partitioned import PartitionedEngine

    ds = generate_dataset(8192, seed=90, categories=20)
    # all type-2, ~3% T spans clustered in two T bands: too wide for the
    # route bucket, and each start-sorted 64-query batch covers ≤ nt/2
    # tiles so the window path engages
    qs = generate_queries(128, seed=91, categories=20, types=(2,))
    rng5 = np.random.default_rng(5)
    qs.l[:64] = np.sort(rng5.uniform(-3.0, -1.2, 64))
    qs.l[64:] = np.sort(rng5.uniform(0.8, 2.6, 64))
    qs.r[:] = qs.l + 0.2
    eng = PartitionedEngine(
        ds, db_tile=512, query_batch=64, scan_impl="pallas_v3",
        route_buckets=(128,), time_view_min_queries=1,
    )
    assert eng.scan_impl == "pallas_v3"
    calls = []
    jw, jwg = eng._jit_window, eng._jit_window_group

    def spy(f):
        def g(*a, **k):
            calls.append(k.get("ntw"))
            return f(*a, **k)
        return g

    eng._jit_window, eng._jit_window_group = spy(jw), spy(jwg)
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert calls, "window path never engaged"
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_sharded_v3_matches_oracle():
    """ShardedEngine with the v3 kernel per shard (interpret, 8-dev CPU
    mesh): oracle-exact through the shard_map + ICI merge."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.sharded import ShardedEngine

    ds = generate_dataset(6000, seed=92, categories=20)
    qs = generate_queries(32, seed=93, categories=20)
    eng = ShardedEngine(ds, db_tile=256, query_batch=32,
                        scan_impl="pallas_v3")
    assert eng.scan_impl == "pallas_v3" and eng.scan_layout == "axis1"
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_partitioned_sharded_v3_matches_oracle():
    """ShardedPartitionedEngine full path on the v3 kernel per shard
    (interpret): oracle-exact."""
    from hvq_tpu.models.oracle import search_oracle
    from hvq_tpu.models.partitioned_sharded import ShardedPartitionedEngine

    ds = generate_dataset(6144, seed=94, categories=20)
    qs = generate_queries(32, seed=95, categories=20)
    eng = ShardedPartitionedEngine(
        ds, db_tile=256, query_batch=32, scan_impl="pallas_v3",
        route_buckets=(256,),
    )
    assert eng.scan_impl == "pallas_v3"
    oids, odists = search_oracle(ds, qs)
    ids, dists = eng.search(qs)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_non_divisible_query_batch():
    """query_batch values the kernel b_block caps don't divide (384 > 256)
    must not raise: b_block falls back to the largest divisor of B
    (ADVICE r3 for v3; the opt-in v2 call site got the same fix in r4)."""
    from hvq_tpu.models.oracle import search_oracle

    ds = generate_dataset(2048, seed=96, categories=8)
    qs = generate_queries(384, seed=97, categories=8)
    oids, odists = search_oracle(ds, qs)
    for impl in ("pallas_v2", "pallas_v3"):
        eng = BatchedEngine(ds, db_tile=512, query_batch=384, scan_impl=impl)
        ids, dists = eng.search(qs)
        assert_results_match(ds, qs, ids, dists, oids, odists)
        assert recall_at_k(ids, oids, dists, odists) == 1.0
