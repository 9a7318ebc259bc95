"""PagedEngine (out-of-HBM streaming mode) vs the oracle.

Windows are forced far smaller than the dataset so every search crosses
multiple upload/scan/merge cycles; the differential contract is the usual
one (recomputed distances within 0.002, recall@100 == 1.0 on exact paths).
"""

import numpy as np
import pytest

from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.models.paged import PagedEngine
from hvq_tpu.utils.compare import recall_at_k
from hvq_tpu.utils.generators import generate_dataset, generate_queries

from conftest import assert_results_match


def _check(eng, ds, qs, k=100, sp=1.0):
    oids, odists = search_oracle(ds, qs, k=k, sample_proportion=sp)
    ids, dists = eng.search(qs, k=k, sample_proportion=sp)
    assert_results_match(ds, qs, ids, dists, oids, odists)
    assert recall_at_k(ids, oids, dists, odists) == 1.0


def test_paged_matches_oracle(small_ds, small_qs):
    # 2000 rows, 512-row windows → 4 windows, ragged tail (2000 % 512)
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512
    )
    assert len(eng.windows) == 4
    _check(eng, small_ds, small_qs)


def test_paged_sample_proportion(small_ds, small_qs):
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512
    )
    _check(eng, small_ds, small_qs, sp=0.37)


def test_paged_heavy_padding():
    ds = generate_dataset(1500, seed=9, categories=500)   # ~3 rows/category
    qs = generate_queries(8, seed=10, categories=500, types=(1, 3))
    eng = PagedEngine(ds, db_tile=128, query_batch=8, window_rows=384)
    _check(eng, ds, qs)


def test_paged_v3_interpret(small_ds, small_qs):
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=1024,
        scan_impl="pallas_v3",
    )
    assert eng.scan_impl == "pallas_v3"
    _check(eng, small_ds, small_qs)


def test_paged_bf16_plane(small_ds, small_qs):
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512,
        scan_store="bf16",
    )
    _check(eng, small_ds, small_qs)


def test_paged_rerun_path(small_ds, small_qs):
    """bin_top=1 + repair off saturates bins constantly: the certificate
    must flag and the per-window streaming rerun must restore exactness."""
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512,
        bin_top=1, repair_bins=0,
    )
    _check(eng, small_ds, small_qs)


def test_paged_rerun_never_reuploads(small_ds, small_qs):
    """The running-threshold certificate resolves suspects while the window
    is resident: even under constant flagging (bin_top=1) each window is
    uploaded EXACTLY once per search (VERDICT r4 #4 — the r4 design paid a
    1.36× wire multiplier on flagged-window re-uploads)."""
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512,
        bin_top=1, repair_bins=0,
    )
    uploads = []
    orig = eng._upload_window

    def counting(w0, wlen):
        uploads.append(w0)
        return orig(w0, wlen)

    eng._upload_window = counting
    _check(eng, small_ds, small_qs)
    assert sorted(uploads) == [w0 for w0, _ in eng.windows]


def test_paged_k_contract(small_ds, small_qs):
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512
    )
    _check(eng, small_ds, small_qs, k=10)
    _check(eng, small_ds, small_qs, k=128)


def test_paged_registry():
    from hvq_tpu.models.registry import get_engine

    assert get_engine("paged") is PagedEngine


def test_paged_ragged_query_count(small_ds):
    # m=50 not a multiple of query_batch=32: the certificate threshold must
    # be computed over the REAL queries only, not the padded batch rows
    # (regression: (m,) qn broadcast against (m_pad,) k-th distances)
    qs = generate_queries(50, seed=23, categories=20)
    eng = PagedEngine(
        small_ds, db_tile=256, query_batch=32, window_rows=512
    )
    assert eng.certified and eng.bin_top is not None
    _check(eng, small_ds, qs)
