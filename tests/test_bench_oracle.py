"""bench.py's overlapped-oracle machinery (regression: resume alignment).

The round-3 driver artifact nearly shipped a false "dist_check: different":
the synchronous enrichment pass re-called OracleThread.run() on the same
object, which restarted at query 0 and double-appended it — misaligning
every later oracle row against the engine's results. run() must resume
from len(oids).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hvq_tpu.models.oracle import search_oracle
from hvq_tpu.utils.generators import generate_dataset, generate_queries


def test_oracle_thread_resumes_without_duplicating():
    import bench

    ds = generate_dataset(2000, seed=0, categories=30)
    qs = generate_queries(6, seed=1, categories=30)
    o = bench.OracleThread(ds, qs, 3)
    o.check_n = 1
    o.run()                      # the overlap phase finished one query
    assert len(o.oids) == 1
    o.check_n = 3
    o.run()                      # enrichment re-run must RESUME, not restart
    assert len(o.oids) == 3
    for i in range(3):
        sub = type(qs)(
            qtype=qs.qtype[i : i + 1], v=qs.v[i : i + 1],
            l=qs.l[i : i + 1], r=qs.r[i : i + 1], V=qs.V[i : i + 1],
        )
        oid, od = search_oracle(ds, sub)
        np.testing.assert_array_equal(o.oids[i], oid[0])
        np.testing.assert_allclose(o.odists[i], od[0])


def test_check_fields_alignment():
    import bench

    ds = generate_dataset(2000, seed=2, categories=30)
    qs = generate_queries(4, seed=3, categories=30)
    o = bench.OracleThread(ds, qs, 2)
    o.run()
    oids, odists = search_oracle(ds, qs)
    fields = bench._check_fields(ds, qs, oids, odists, o)
    assert fields["checked_queries"] == 2
    assert fields["recall_at_100"] == 1.0
    assert fields["dist_check"] in ("same", "similar")
