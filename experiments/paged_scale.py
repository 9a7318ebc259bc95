"""On-chip PagedEngine validation at a D where resident views exceed HBM.

The resident engines cap at n_pad·(512+16) bytes ≤ HBM-minus-workspace —
~2.5·10⁷ fp32 rows on a 16 GB v5e (the partitioned flagship with two
views caps at ~1.2·10⁷). This drives the paged mode at D = 2.5·10⁷
(13.2 GB resident + workspace would already evict the bf16 plane; 3·10⁷
wouldn't fit at all) with ~8M-row windows, checks a 16-query slice
against the batched host oracle, and reports the wall split — upload-
bound by design (the database crosses the relay once per search pass).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/paged_scale.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.models.oracle import search_oracle_batched  # noqa: E402
from hvq_tpu.models.paged import PagedEngine  # noqa: E402
from hvq_tpu.utils.compare import compare_distances, recall_at_k  # noqa: E402
from hvq_tpu.utils.formats import recompute_result_distances  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402
from hvq_tpu.utils.timing import PhaseTimer  # noqa: E402

N = int(os.environ.get("PGS_N", 25_000_000))
M = int(os.environ.get("PGS_M", 2048))
WROWS = int(os.environ.get("PGS_W", 8_388_608))
CHECK = int(os.environ.get("PGS_CHECK", 16))


def main():
    print(f"device: {jax.devices()[0]} N={N} M={M} window={WROWS}",
          flush=True)
    t0 = time.perf_counter()
    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(M, seed=1, categories=1000)
    print(f"generate: {time.perf_counter() - t0:.0f}s", flush=True)

    eng = PagedEngine(ds, window_rows=WROWS)
    print(f"windows: {eng.windows} scan_impl={eng.scan_impl} "
          f"bin_top={eng.bin_top}", flush=True)
    ph = PhaseTimer()
    t0 = time.perf_counter()
    ids, dists = eng.search(qs, phases=ph)
    wall = time.perf_counter() - t0
    split = {k.removeprefix("search/"): round(v, 1)
             for k, v in sorted(ph.totals.items())}
    print(f"search wall {wall:.1f}s  ({M / wall:.1f} QPS, capacity mode) "
          f"split(s)={split}", flush=True)

    sub = type(qs)(qtype=qs.qtype[:CHECK], v=qs.v[:CHECK],
                   l=qs.l[:CHECK], r=qs.r[:CHECK], V=qs.V[:CHECK])
    t0 = time.perf_counter()
    oids, odists = search_oracle_batched(ds, sub, qblock=CHECK)
    print(f"oracle ({CHECK} queries): {time.perf_counter() - t0:.0f}s",
          flush=True)
    res = compare_distances(
        recompute_result_distances(ds, sub, ids[:CHECK].astype(np.int64)),
        recompute_result_distances(ds, sub, oids.astype(np.int64)),
    )
    rec = recall_at_k(ids[:CHECK], oids, dists[:CHECK], odists)
    print(f"dist={res.status} max_diff={res.max_abs_diff} recall={rec}",
          flush=True)
    assert res.ok and rec == 1.0


if __name__ == "__main__":
    main()
