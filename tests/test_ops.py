"""Unit tests: ops primitives, timers, profiling, collectives."""

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu.models.common import tail_block_np
from hvq_tpu.ops import topk as topk_ops
from hvq_tpu.ops.distance import pad_vectors_np, squared_norms, tile_scores
from hvq_tpu.ops.kmeans import fit_kmeans
from hvq_tpu.utils.timing import PhaseTimer, time_fn


def test_tile_scores_match_direct():
    rng = np.random.default_rng(0)
    q = pad_vectors_np(rng.standard_normal((8, 100)).astype(np.float32))
    v = pad_vectors_np(rng.standard_normal((32, 100)).astype(np.float32))
    dn = squared_norms(jnp.asarray(v))
    s = np.asarray(tile_scores(jnp.asarray(q), jnp.asarray(v), dn))
    direct = ((v[None, :, :] - q[:, None, :]) ** 2).sum(-1) - (q ** 2).sum(-1)[:, None]
    np.testing.assert_allclose(s, direct, rtol=1e-4, atol=1e-2)


def test_merge_topk_streaming_equals_global():
    rng = np.random.default_rng(1)
    scores = rng.standard_normal((4, 1024)).astype(np.float32)
    ids = np.tile(np.arange(1024, dtype=np.int32), (4, 1))
    carry = (jnp.full((4, 64), jnp.inf), jnp.zeros((4, 64), jnp.int32))
    for s in range(0, 1024, 256):
        carry = topk_ops.merge_topk(
            carry[0], carry[1],
            jnp.asarray(scores[:, s : s + 256]),
            jnp.asarray(ids[:, s : s + 256] + 0),
            64,
        )
    got_ids = np.sort(np.asarray(carry[1]), axis=1)
    want_ids = np.sort(np.argsort(scores, axis=1)[:, :64], axis=1)
    np.testing.assert_array_equal(got_ids, want_ids)


def test_bin_reduce_min_keeps_best_per_bin():
    rng = np.random.default_rng(2)
    s = rng.standard_normal((2, 256)).astype(np.float32)
    ids = np.tile(np.arange(256, dtype=np.int32), (2, 1))
    sm, im = topk_ops.bin_reduce_min(jnp.asarray(s), jnp.asarray(ids), 128)
    assert sm.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(sm)[0, 0], s[0, :128].min())
    assert np.asarray(im)[0, 0] == int(np.argmin(s[0, :128]))


def test_tail_block():
    V = np.arange(12, dtype=np.float32).reshape(6, 2)
    Vfull = np.zeros((6, 100), np.float32)
    Vfull[:, :2] = V
    t = tail_block_np(Vfull, t=3)
    assert t.shape == (3, 128)
    np.testing.assert_array_equal(t[0, :2], V[5])  # row j = V[n-1-j]
    np.testing.assert_array_equal(t[2, :2], V[3])


def test_kmeans_separates_obvious_clusters():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.1, (128, 128)).astype(np.float32)
    b = rng.normal(10, 0.1, (128, 128)).astype(np.float32)
    X = jnp.asarray(np.concatenate([a, b]))
    cents, assign = fit_kmeans(X, 256, 2, iters=5, db_tile=256, seed=0)
    assert len(set(assign[:128])) == 1 and len(set(assign[128:])) == 1
    assert assign[0] != assign[200]


def test_phase_timer_and_time_fn():
    t = PhaseTimer()
    x = jnp.ones((128, 128))
    with t.phase("mm", x):
        y = x @ x
    assert t.totals["mm"] > 0 and t.counts["mm"] == 1
    report = t.report()
    assert "mm" in report
    sec = time_fn(lambda a: a @ a, x, warmup=1, iters=2)
    assert sec > 0


def test_cost_analysis_and_memory_stats():
    from hvq_tpu.utils.profiling import cost_analysis, device_memory_stats

    ca = cost_analysis(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert isinstance(ca, dict)
    assert isinstance(device_memory_stats(), dict)


def test_allgather_topk_merge_8dev():
    from jax.sharding import Mesh, PartitionSpec as P

    from hvq_tpu.parallel.collectives import allgather_topk_merge

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("d",))
    nd = devs.size
    rng = np.random.default_rng(4)
    scores = rng.standard_normal((nd, 4, 16)).astype(np.float32)
    ids = rng.integers(0, 10_000, (nd, 4, 16)).astype(np.int32)

    def f(s, i):
        return allgather_topk_merge(s[0], i[0], 16, axis_name="d")

    out_s, out_i = jax.jit(
        shard_map(
            f, mesh=mesh,
            in_specs=(P("d"), P("d")), out_specs=(P(), P()),
            check_vma=False,
        )
    )(jnp.asarray(scores), jnp.asarray(ids))
    flat = scores.transpose(1, 0, 2).reshape(4, -1)
    flat_i = ids.transpose(1, 0, 2).reshape(4, -1)
    order = np.argsort(flat, axis=1)[:, :16]
    np.testing.assert_allclose(
        np.asarray(out_s), np.take_along_axis(flat, order, 1), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(out_i), 1),
        np.sort(np.take_along_axis(flat_i, order, 1), 1),
    )


def test_track_host_memory():
    from hvq_tpu.utils.timing import track_host_memory

    with track_host_memory() as mem:
        buf = np.ones((1024, 1024), np.float32)  # ~4 MB
        del buf
    assert mem["peak_bytes"] > 4_000_000


def test_packed_tournament_equals_rounds():
    """packed_top2_tournament must select the same top-2 keys per bin as
    the round-based (min, mask winner, min) reduce — identical distances
    everywhere and identical positions for every finite (non-empty) slot.
    Empty slots (+inf) may legally differ in lane id: rounds re-uses the
    masked-out INF_PACK (lane 0) while the tournament returns the next
    distinct +inf key; finalize masks non-finite entries either way."""
    import jax.numpy as jnp

    from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla

    rng = np.random.default_rng(0)
    n, B = 4096, 32
    Vp = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    C = jnp.floor(jnp.asarray(rng.uniform(0, 20, n).astype(np.float32)))
    T = jnp.asarray(rng.uniform(-3, 3, n).astype(np.float32))
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(n, dtype=jnp.int32)
    qV = jnp.asarray(rng.standard_normal((B, 128)).astype(np.float32))
    ac = jnp.asarray(rng.uniform(size=B) < 0.5)
    at = jnp.asarray(rng.uniform(size=B) < 0.5)
    v = jnp.floor(jnp.asarray(rng.uniform(0, 20, B).astype(np.float32)))
    l = jnp.asarray(rng.uniform(-3, 0, B).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 3, B).astype(np.float32))
    sn = jnp.int32(n - 100)

    for masked in (True, False):
        d_r, p_r = deferred_packed_scan_xla(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
            db_tile=512, bin_top=2, reduce_impl="rounds", masked=masked,
        )
        d_t, p_t = deferred_packed_scan_xla(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
            db_tile=512, bin_top=2, reduce_impl="tournament", masked=masked,
        )
        d_r, d_t = np.asarray(d_r), np.asarray(d_t)
        p_r, p_t = np.asarray(p_r), np.asarray(p_t)
        np.testing.assert_array_equal(d_r, d_t)
        finite = np.isfinite(d_r)
        np.testing.assert_array_equal(p_r[finite], p_t[finite])


def test_windowed_scan_equals_full_on_window():
    """row0/ntw window scan must return exactly the full scan's keys for
    the window's tiles, with GLOBAL positions."""
    import jax.numpy as jnp

    from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla

    rng = np.random.default_rng(3)
    n, B, Dt = 8192, 16, 512
    Vp = jnp.asarray(rng.standard_normal((n, 128)).astype(np.float32))
    C = jnp.floor(jnp.asarray(rng.uniform(0, 20, n).astype(np.float32)))
    T = jnp.asarray(np.sort(rng.uniform(-3, 3, n).astype(np.float32)))
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.asarray(rng.permutation(n).astype(np.int32))
    qV = jnp.asarray(rng.standard_normal((B, 128)).astype(np.float32))
    ac = jnp.zeros(B, bool)
    at = jnp.ones(B, bool)
    v = jnp.full(B, -1.0, jnp.float32)
    l = jnp.asarray(rng.uniform(-3, 0, B).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 3, B).astype(np.float32))
    sn = jnp.int32(n)

    for layout in ("lane", "axis1"):
        for t0, ntw in ((4, 8), (0, 4), (9, 7)):
            d_f, p_f = deferred_packed_scan_xla(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=Dt, bin_top=2, layout=layout,
            )
            d_w, p_w = deferred_packed_scan_xla(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=Dt, bin_top=2, layout=layout,
                row0=jnp.int32(t0 * Dt), ntw=ntw,
            )
            # full-scan columns are tile-major: window tiles are a slice
            bins = Dt // 128
            wpt = 2 * bins                        # candidates per tile
            sl = slice(t0 * wpt, (t0 + ntw) * wpt)
            np.testing.assert_array_equal(
                np.asarray(d_f)[:, sl], np.asarray(d_w)
            )
            d_w_np = np.asarray(d_w)
            finite = np.isfinite(d_w_np)
            np.testing.assert_array_equal(
                np.asarray(p_f)[:, sl][finite], np.asarray(p_w)[finite]
            )
