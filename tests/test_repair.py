"""In-program bin repair (models.common.bin_repair_candidates).

The packed bin scan keeps top-R per 128-row bin; a bin holding R+1 of a
query's true top-k used to force a full-view rerun through the escalation
ladder. Repair exact-refines the rb most-saturated bins inside the search
program, so a benign collision is fixed silently (no suspect flag, no
ladder) while attacks wider than rb bins still flag and escalate.

The partitioned engine scans its (C, T)-sorted cat view, so adversarial
placement goes through the view permutation: ``_plant_view_bin`` resolves
which ORIGINAL ids land in a chosen view bin (axis1 decode,
ops/pallas_scan.py:506-516: bin b of tile t = view positions
t*db_tile + s*bins + b, s in [0, BIN)) and edits those rows. k=10 keeps
the benign Poisson load negligible at n=60k (~469 bins), so the planted
collision is the only saturated bin.
"""

import numpy as np

import hvq_tpu
from hvq_tpu.index.partition import PartitionedIndex
from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

N = 60_000
DB_TILE = 2048
BIN = 128
BINS = DB_TILE // BIN  # per-tile bin count (axis1 stride)


def _data(seed=1):
    ds = generate_dataset(N, seed=seed, categories=30)
    qs = generate_queries(8, seed=2, categories=30)
    qs.qtype[:] = 0
    return ds, qs


def _view_ids(ds, bin_no: int, slices) -> np.ndarray:
    """Original ids that land at view bin ``bin_no`` (tile 0), given axis1
    slice numbers. C/T are not modified by the tests, so the engine's own
    index build reproduces the same permutation."""
    idx = PartitionedIndex.build(ds, db_tile=DB_TILE)
    oid = np.asarray(idx.cat_view.oid)
    pos = bin_no + BINS * np.asarray(slices)
    ids = oid[pos]
    assert (ids < N).all(), "planting positions must be real rows"
    return ids


def _plant(ds, qs, bin_no, n_rows, rng, sigma=1e-4):
    ids = _view_ids(ds, bin_no, np.arange(n_rows))
    ds.V[ids] = qs.V[0] + rng.normal(
        0, sigma, (n_rows, ds.V.shape[1])
    ).astype(np.float32)
    return ids


def _run(ds, qs, k=10, engine="partitioned", **kw):
    # this module tests the in-program repair mechanism, which is opt-in
    # since r4 (engine default repair_bins=0 = rerun-only, measured faster)
    kw.setdefault("repair_bins", 4)
    eng = hvq_tpu.get_engine(engine)(
        ds, db_tile=DB_TILE, query_batch=8, **kw
    )
    ids, dists = eng.search(qs, k=k)
    oids, odists = search_oracle(ds, qs, k=k)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    return eng


def test_repair_fixes_single_bin_collision_without_ladder(monkeypatch):
    """3 top-k rows in ONE view bin at bin_top=2: repair recovers the
    hidden row in-program — certificate clean, ladder never fires."""
    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    rng = np.random.default_rng(5)
    ds, qs = _data()
    _plant(ds, qs, bin_no=3, n_rows=3, rng=rng)
    eng = _run(ds, qs, bin_top=2)
    assert eng._last_cert_terms is not None
    assert eng._last_cert_terms[0] == 0, (
        f"benign single-bin collision should be repaired silently, "
        f"terms={eng._last_cert_terms[0]:#x}"
    )


def test_attack_wider_than_repair_still_flags_and_escalates(monkeypatch):
    """Hot rows in MORE bins than repair_bins: the residual term must flag
    and the ladder must still deliver exact results."""
    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    rng = np.random.default_rng(6)
    ds, qs = _data()
    for j in range(5):
        _plant(ds, qs, bin_no=3 + 2 * j, n_rows=3, rng=rng)
    eng = _run(ds, qs, bin_top=2, repair_bins=2)
    assert eng._last_cert_terms[0] != 0, "residual bin term must flag"


def test_repair_disabled_keeps_old_ladder(monkeypatch):
    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    rng = np.random.default_rng(5)
    ds, qs = _data()
    _plant(ds, qs, bin_no=3, n_rows=3, rng=rng)
    eng = _run(ds, qs, bin_top=2, repair_bins=0)
    assert eng._last_cert_terms[0] != 0, "without repair the bin term flags"


def test_repair_respects_time_predicate():
    """A WIDE type-2 query rides the dense full-scan path with an active
    time mask. The SAME view bin holds in-range near-duplicates (bin
    saturates, gets selected for repair) AND out-of-range rows that sit
    even closer — the repair mask must exclude the latter or they would
    take top-1."""
    rng = np.random.default_rng(7)
    ds, qs = _data()
    ids = _view_ids(ds, bin_no=9, slices=np.arange(6))
    tv = ds.T[ids]
    # tile 0 of the (C, T)-sorted view is one category's lowest-T run, so
    # T ascends along the bin's slices; a range boundary between slice 2
    # and 3 makes slices 0-2 in-range and 3-5 out-of-range
    assert (np.diff(tv) > 0).all(), "pick a bin without T ties"
    qs.qtype[:] = 2
    qs.l[:] = float(ds.T.min()) - 1.0
    qs.r[:] = float((tv[2] + tv[3]) / 2)
    in_ids, out_ids = ids[:3], ids[3:]
    ds.V[in_ids] = qs.V[0] + rng.normal(0, 1e-4, (3, ds.V.shape[1])).astype(
        np.float32
    )
    ds.V[out_ids] = qs.V[0]  # exact query vector: would take top-1 if the
    # repair mask leaked out-of-range rows
    _run(ds, qs, bin_top=2)


def test_repair_respects_sample_proportion():
    """Repair candidates beyond the sample limit (oid >= sn) must be
    excluded, exactly like the scan's own mask."""
    rng = np.random.default_rng(8)
    ds, qs = _data()
    _plant(ds, qs, bin_no=5, n_rows=3, rng=rng)
    eng = hvq_tpu.get_engine("partitioned")(
        ds, db_tile=DB_TILE, query_batch=8, bin_top=2
    )
    ids, dists = eng.search(qs, k=10, sample_proportion=0.5)
    oids, odists = search_oracle(ds, qs, k=10, sample_proportion=0.5)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_batched_engine_repair_exact():
    """Same single-bin collision through the batched engine's repair path
    — rows are original-order there, so positions ARE ids and planting is
    direct (axis1: bin b of tile 0 = positions b, b+bins, ...)."""
    rng = np.random.default_rng(9)
    ds, qs = _data()
    pos = 3 + (DB_TILE // BIN) * np.arange(3)
    ds.V[pos] = qs.V[0] + rng.normal(0, 1e-4, (3, ds.V.shape[1])).astype(
        np.float32
    )
    eng = hvq_tpu.get_engine("batched")(
        ds, db_tile=DB_TILE, query_batch=8, scan_impl="xla_packed",
        bin_top=2,
    )
    ids, dists = eng.search(qs, k=10)
    oids, odists = search_oracle(ds, qs, k=10)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_sharded_engine_repair_exact():
    """Single-bin collision through the sharded engine: the repair runs
    per shard inside the shard_map (local gathers, global ids via
    id_offset) and its remaining-min joins the pmin'd certificate."""
    rng = np.random.default_rng(11)
    ds, qs = _data()
    pos = 3 + (DB_TILE // BIN) * np.arange(3)  # shard 0, tile 0, bin 3
    ds.V[pos] = qs.V[0] + rng.normal(0, 1e-4, (3, ds.V.shape[1])).astype(
        np.float32
    )
    eng = hvq_tpu.get_engine("sharded")(
        ds, db_tile=DB_TILE, query_batch=8, scan_impl="xla_packed",
        bin_top=2,
    )
    ids, dists = eng.search(qs, k=10)
    oids, odists = search_oracle(ds, qs, k=10)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_repair_gate_path_still_repairs(monkeypatch):
    """repair_gate=True (non-default: measured 10% slower at D=10⁷, kept
    as a knob) must still silently repair a genuinely saturated bin — the
    provisional threshold provably exceeds the final one, so a real
    collision is never gated off."""
    monkeypatch.setenv("HVQ_CERT_TERMS", "1")
    rng = np.random.default_rng(12)
    ds, qs = _data()
    _plant(ds, qs, bin_no=7, n_rows=3, rng=rng)
    eng = _run(ds, qs, bin_top=2, repair_gate=True)
    assert eng._last_cert_terms[0] == 0, "gated repair must stay silent"


def test_sharded_attack_wider_than_repair_escalates():
    """Sharded: hot rows in more local bins than repair_bins — the pmin'd
    residual must flag and the distributed ladder must restore exactness."""
    rng = np.random.default_rng(13)
    ds, qs = _data()
    bins = DB_TILE // BIN
    for j in range(5):
        pos = (3 + 2 * j) + bins * np.arange(3)  # shard 0, tile 0
        ds.V[pos] = qs.V[0] + rng.normal(
            0, 1e-4, (3, ds.V.shape[1])
        ).astype(np.float32)
    eng = hvq_tpu.get_engine("sharded")(
        ds, db_tile=DB_TILE, query_batch=8, scan_impl="xla_packed",
        bin_top=2, repair_bins=2,
    )
    calls = []
    orig = eng._rerun_suspects

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    eng._rerun_suspects = spy
    ids, dists = eng.search(qs, k=10)
    oids, odists = search_oracle(ds, qs, k=10)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
    assert calls, "sharded residual bin term must escalate to the ladder"


def test_lane_layout_repair():
    """Lane-layout decode: bin b holds contiguous view positions
    b*128..b*128+127 — plant 3 dups in one contiguous block (batched
    engine, original order)."""
    rng = np.random.default_rng(10)
    ds, qs = _data()
    ds.V[256:259] = qs.V[0] + rng.normal(0, 1e-4, (3, ds.V.shape[1])).astype(
        np.float32
    )
    eng = hvq_tpu.get_engine("batched")(
        ds, db_tile=DB_TILE, query_batch=8, scan_impl="xla_packed",
        bin_top=2, scan_layout="lane", repair_bins=4,
    )
    ids, dists = eng.search(qs, k=10)
    oids, odists = search_oracle(ds, qs, k=10)
    assert recall_at_k(ids, oids, dists, odists) == 1.0
