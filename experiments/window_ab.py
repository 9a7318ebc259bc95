"""Wide-type-2 window path: keep or kill (VERDICT r3 #6).

The windowed dense scan measured net-NEGATIVE in r2 (7892 vs 7964 at
D=10⁷, forced) and is budget-disabled there; its surviving regime is
D≈2·10⁶ (both views fit) with a type-2-heavy workload. Round 4 moved the
window onto the v3 kernel (it previously fell back to the XLA twin), so
this A/B decides the path's fate on its best-case turf:

  * D = 2·10⁶, Q = 8192, types (2,) with ~5-10% T spans (wide: unroutable)
  * A: window ENABLED  (time_view materialized, ntw buckets nt/8..nt/2)
  * B: window DISABLED (time_view_max_bytes=0 → dense cat-view scans)

Decision rule (CHANGELOG): keep gated to this regime if A wins ≥ 10%
steady-state; otherwise delete `_search_full_window*` + the lazy time
view machinery.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/window_ab.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.models.partitioned import PartitionedEngine  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402
from hvq_tpu.utils.timing import PhaseTimer  # noqa: E402

N = int(os.environ.get("WAB_N", 2_000_000))
M = int(os.environ.get("WAB_M", 8192))
REPS = int(os.environ.get("WAB_REPS", 3))


def main():
    print(f"device: {jax.devices()[0]} N={N} M={M}", flush=True)
    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(M, seed=1, categories=1000, types=(2,))
    # wide-but-windowable spans: ~6% of the T range each, start-clustered
    # so a start-sorted batch's window stays ≤ nt/2 tiles
    rng = np.random.default_rng(2)
    centers = rng.uniform(-2.8, 2.4, 16)
    qs.l[:] = np.repeat(centers, M // 16)[:M] + rng.uniform(-0.05, 0.05, M)
    qs.r[:] = qs.l + 0.4
    print(
        "span rows ~",
        int(np.mean(qs.r - qs.l) / 6.0 * N),
        "routable cap 32768",
        flush=True,
    )

    def timeit(name, eng):
        eng.search(qs, return_dists=False)
        ts, ph = [], None
        for _ in range(REPS):
            ph = PhaseTimer()
            t0 = time.perf_counter()
            eng.search(qs, return_dists=False, phases=ph)
            ts.append(time.perf_counter() - t0)
        w = sorted(ts)[len(ts) // 2]
        split = {k.removeprefix("search/"): round(v * 1e3)
                 for k, v in sorted(ph.totals.items())}
        print(f"{name:28s} {M / w:8.0f} QPS  walls="
              f"{[f'{t:.2f}' for t in ts]} {split}", flush=True)

    timeit("A window ON (v3 kernel)", PartitionedEngine(
        ds, time_view_min_queries=1, time_view_max_bytes=4_000_000_000))
    timeit("B window OFF (dense)", PartitionedEngine(
        ds, time_view_max_bytes=0))


if __name__ == "__main__":
    main()
