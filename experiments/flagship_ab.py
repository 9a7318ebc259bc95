"""Flagship-scale A/B: repair ladder + bf16 plane at D=10⁷ (VERDICT r3 #1/#2).

The D=10⁶ tail sweep (v3_tail_sweep.py) found the single biggest engine
lever left: disabling the in-program bin repair (repair_bins=0) and letting
the certificate's compacted rerun ladder absorb the suspects measured
16238 → 23109 QPS (+42%) — the repair gather + widened refine costs
~19 ms/batch while the rerun wall for the same suspects was ~4 ms/batch.
It also showed the bf16 plane's r3 default kprime=256 is what made it lose
end-to-end (k'=192 flips the sign; 128 melts down in rerun storms).

This validates both levers where the headline lives: PartitionedEngine,
D=10⁷ mixed (the exact bench dataset, so the /dev/shm cache is shared with
bench.py), M=8192 queries. Every variant's distances are differentially
compared against the shipped fp32 default under the 0.002 contract
(reference: src/compare_data.cpp:5).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/flagship_ab.py
Env:  FAB_N (default 10_000_000), FAB_M (8192), FAB_REPS (3)
"""
import gc
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import load_or_generate  # noqa: E402
from hvq_tpu.index.partition import PartitionedIndex  # noqa: E402
from hvq_tpu.models.partitioned import PartitionedEngine  # noqa: E402
from hvq_tpu.utils.formats import QuerySet  # noqa: E402
from hvq_tpu.utils.timing import PhaseTimer  # noqa: E402

N = int(os.environ.get("FAB_N", 10_000_000))
M = int(os.environ.get("FAB_M", 8192))
REPS = int(os.environ.get("FAB_REPS", 3))


def slice_queries(qs, m):
    return QuerySet(qtype=qs.qtype[:m], v=qs.v[:m], l=qs.l[:m], r=qs.r[:m],
                    V=qs.V[:m])


def main():
    print(f"device: {jax.devices()[0]} N={N} M={M}", flush=True)
    ds, qs_full = load_or_generate(N, 40_000, 1000, None, (0, 1, 2, 3))
    qs = slice_queries(qs_full, M)

    ref_dists = None

    def timeit(name, eng):
        nonlocal ref_dists
        t0 = time.perf_counter()
        ids, dists = eng.search(qs, return_dists=True)   # compile + warm
        print(f"  [{name}] warm {time.perf_counter() - t0:.0f}s", flush=True)
        if ref_dists is None:
            ref_dists = np.asarray(dists, np.float32)
            diff = 0.0
        else:
            diff = float(np.max(np.abs(np.asarray(dists, np.float32)
                                       - ref_dists)))
        ts, ph = [], None
        for _ in range(REPS):
            ph = PhaseTimer()
            t0 = time.perf_counter()
            eng.search(qs, return_dists=False, phases=ph)
            ts.append(time.perf_counter() - t0)
        w = sorted(ts)[len(ts) // 2]
        split = {k.removeprefix("search/"): round(v * 1e3)
                 for k, v in sorted(ph.totals.items()) if v * 1e3 >= 1}
        print(f"{name:34s} {M / w:8.0f} QPS  max|dist-ref|={diff:.4g}  "
              f"walls={[f'{t:.2f}' for t in ts]} {split}", flush=True)

    for store, variants in (
        ("fp32", [
            ("fp32 v3 default (r3 ship)", {}),
            ("fp32 v3 repair=0", dict(repair_bins=0)),
        ]),
        ("bf16", [
            ("bf16 plane k'=256 (r3 dflt)", {}),
            ("bf16 plane k'=256 repair=0", dict(repair_bins=0)),
            ("bf16 plane k'=192", dict(kprime=192)),
            ("bf16 plane k'=192 repair=0", dict(kprime=192, repair_bins=0)),
        ]),
    ):
        t0 = time.perf_counter()
        idx = PartitionedIndex.build(ds, db_tile=16384, scan_store=store)
        print(f"[{store} index built in {time.perf_counter() - t0:.0f}s]",
              flush=True)
        for name, kw in variants:
            try:
                timeit(name, PartitionedEngine(ds, scan_impl="pallas_v3",
                                               index=idx, **kw))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
        del idx
        gc.collect()


if __name__ == "__main__":
    main()
