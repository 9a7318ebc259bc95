"""Benchmark runner: hybrid k-NN QPS on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Default config mirrors the reference's medium set (D=10^6, Q=10^4,
BASELINE.md: best 68.11 s on 6 CPU threads => 146.8 QPS). Environment
overrides:

  HVQ_BENCH_N        database rows        (default 1_000_000)
  HVQ_BENCH_Q        total queries        (default 10_000)
  HVQ_BENCH_ENGINE   engine name          (default "batched")
  HVQ_BENCH_BASELINE baseline QPS         (default computed from N)
  HVQ_BENCH_CATS     category count       (default 1000, contest-like)
  HVQ_BENCH_CHECK    oracle spot-check queries (default 5)
  HVQ_BENCH_CLUSTERS mixture clusters (0 = uniform reference distribution)
  HVQ_BENCH_DTYPE    "bf16" = low-precision fast mode (recall reported)
  HVQ_BENCH_SCAN_IMPL / HVQ_BENCH_DB_TILE / HVQ_BENCH_QB / HVQ_BENCH_PRECISION
  HVQ_BENCH_LOG      markdown file to append a CHANGELOG-style row to

Baseline QPS (reference, i5-8400 6C best case, BASELINE.md):
  D=10^4:  10^4 q / 0.66 s  = 15152 QPS   (report "Optimization #2")
  D=10^6:  10^4 q / 68.11 s =   147 QPS   (pptx chart5)
  D=10^7:  10^4 q / 664 s   =    15 QPS   (pptx chart6)
"""

from __future__ import annotations

import json
import os
import sys
import time


def _baseline_qps(n: int) -> float:
    if n >= 5_000_000:
        return 10_000 / 664.0
    if n >= 500_000:
        return 10_000 / 68.11
    return 10_000 / 0.66


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

    import numpy as np

    from hvq_tpu.models.registry import get_engine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries
    from hvq_tpu.utils.timing import PhaseTimer

    # Default = the reference's LARGE set (D=10^7, Q=4x10^4): the config
    # BASELINE.json's headline metric is defined on (CPU best: 15 QPS).
    n = int(os.environ.get("HVQ_BENCH_N", 10_000_000))
    q = int(os.environ.get("HVQ_BENCH_Q", 40_000))
    # partitioned: the measured winner on the mixed contest workload
    # (7364 QPS at D=10⁷ vs the dense engine's 4506, r2) — selective
    # queries route to shared windows, wide ones share the dense scan
    engine_name = os.environ.get("HVQ_BENCH_ENGINE", "partitioned")
    cats = int(os.environ.get("HVQ_BENCH_CATS", 1000))
    baseline = float(os.environ.get("HVQ_BENCH_BASELINE", _baseline_qps(n)))

    clusters = int(os.environ.get("HVQ_BENCH_CLUSTERS", 0)) or None
    # e.g. HVQ_BENCH_TYPES=1,3 → selective-predicate-only workload
    types = tuple(
        int(t) for t in os.environ.get("HVQ_BENCH_TYPES", "0,1,2,3").split(",")
    )

    # First backend touch pays the relay/device initialization (measured
    # 300-900 s through this environment's tunnel, experiments round 2:
    # an 8 MB first upload took 860 s while the next ran at 38 MB/s).
    # Start it NOW on a thread so it overlaps the host-side generate.
    import threading

    def _warm_device():
        try:
            import jax.numpy as jnp

            float(jnp.sum(jnp.ones(8)))
        except Exception:
            pass

    _init_t = threading.Thread(target=_warm_device, daemon=True)
    _init_t.start()

    timer = PhaseTimer()
    with timer.phase("generate"):
        ds = generate_dataset(n, seed=0, categories=cats, clusters=clusters)
        qs = generate_queries(
            q, seed=1, categories=cats, clusters=clusters, centers_seed=0,
            types=types,
        )

    engine_kwargs = {}
    if os.environ.get("HVQ_BENCH_SCAN_IMPL"):
        engine_kwargs["scan_impl"] = os.environ["HVQ_BENCH_SCAN_IMPL"]
    if os.environ.get("HVQ_BENCH_DB_TILE"):
        engine_kwargs["db_tile"] = int(os.environ["HVQ_BENCH_DB_TILE"])
    if os.environ.get("HVQ_BENCH_QB"):
        engine_kwargs["query_batch"] = int(os.environ["HVQ_BENCH_QB"])
    if os.environ.get("HVQ_BENCH_PRECISION"):
        engine_kwargs["precision"] = os.environ["HVQ_BENCH_PRECISION"]
    if os.environ.get("HVQ_BENCH_BIN_TOP"):
        engine_kwargs["bin_top"] = int(os.environ["HVQ_BENCH_BIN_TOP"])
    if os.environ.get("HVQ_BENCH_SCAN_LAYOUT"):
        engine_kwargs["scan_layout"] = os.environ["HVQ_BENCH_SCAN_LAYOUT"]
    if os.environ.get("HVQ_BENCH_L2W"):
        engine_kwargs["l2_min_w"] = int(os.environ["HVQ_BENCH_L2W"])
    if os.environ.get("HVQ_BENCH_KPRIME"):
        engine_kwargs["kprime"] = int(os.environ["HVQ_BENCH_KPRIME"])
    if os.environ.get("HVQ_BENCH_REPAIR"):
        # any dense engine: in-program bin-repair width (0 disables)
        engine_kwargs["repair_bins"] = int(os.environ["HVQ_BENCH_REPAIR"])
    if os.environ.get("HVQ_BENCH_REPAIR_GATE"):
        # 0 = ungated repair (gather all selected bins' rows)
        engine_kwargs["repair_gate"] = (
            os.environ["HVQ_BENCH_REPAIR_GATE"] != "0"
        )
    if os.environ.get("HVQ_BENCH_TV_MAX"):
        # partitioned: time-view byte budget (0 disables the 2nd view)
        engine_kwargs["time_view_max_bytes"] = int(
            os.environ["HVQ_BENCH_TV_MAX"]
        )
    if os.environ.get("HVQ_BENCH_DTYPE") == "bf16":
        import jax.numpy as jnp

        engine_kwargs["dtype"] = jnp.bfloat16
        engine_kwargs.setdefault("precision", "default")
    _init_t.join()                      # device ready; build = upload only
    with timer.phase("build"):
        engine = get_engine(engine_name)(ds, **engine_kwargs)
    if os.environ.get("HVQ_BENCH_RESILIENT", "1") != "0":
        # the tunneled runtime throws transient INTERNAL errors on long
        # compiles; bounded retries absorb them (utils.resilience)
        from hvq_tpu.utils.resilience import ResilientEngine

        engine = ResilientEngine(engine)

    # Warmup: compile all program shapes. The dispatch plan (group sizes)
    # depends on the full query count, so warm with the full set — the
    # second warm run is then a pure steady-state sanity pass.
    warm_n = q
    warm = type(qs)(
        qtype=qs.qtype[:warm_n],
        v=qs.v[:warm_n],
        l=qs.l[:warm_n],
        r=qs.r[:warm_n],
        V=qs.V[:warm_n],
    )
    # The timed region produces ids only — the reference's vec_query
    # contract (optimized_impl.h:392-437 returns ids; .dist is recomputed
    # from ids AFTER the timed region, src/test.cpp:95-110). Engines that
    # don't support the flag are timed with the full fetch.
    import inspect

    base_search = getattr(engine, "engine", engine).search
    search_kw = (
        {"return_dists": False}
        if "return_dists" in inspect.signature(base_search).parameters
        and os.environ.get("HVQ_BENCH_FETCH_DISTS") != "1"
        else {}
    )
    with timer.phase("warmup_compile"):
        engine.search(warm, **search_kw)
        engine.search(warm, **search_kw)  # second call = steady-state sanity

    # Host HW counters bracket the timed region like the reference's
    # PerfEvent around vec_query (src/test.cpp:82-92); the engine's
    # PhaseTimer records the in-search pack/enqueue/fetch/rerun split.
    from hvq_tpu.native import PerfCounters

    search_timer = PhaseTimer()
    if "phases" in inspect.signature(base_search).parameters:
        search_kw["phases"] = search_timer
    with timer.phase("search"):
        t0 = time.perf_counter()
        with PerfCounters() as pc:
            ids, dists = engine.search(qs, **search_kw)
        wall = time.perf_counter() - t0

    qps = q / wall
    extra = {}
    if search_timer.totals:
        extra["search_phases_ms"] = {
            name.removeprefix("search/"): round(t * 1e3, 1)
            for name, t in sorted(search_timer.totals.items())
        }
    if pc.values:
        rep = pc.report()
        extra["host_counters"] = {
            k: round(v, 3) for k, v in rep.items() if k in ("IPC", "GHz")
        }
        for name in ("cycles", "instructions", "LLC_misses"):
            if name in rep:
                extra["host_counters"][f"{name}_per_query"] = round(
                    rep[name] / max(q, 1), 1
                )
    # Certificate forensics (HVQ_CERT_TERMS=1): histogram of per-query term
    # bitmasks (1 = bin saturation, 2 = level-2, 4 = k'-cut) from the timed
    # run — which term drives the rerun ladder at this config.
    _inner = getattr(engine, "engine", engine)
    _terms = getattr(_inner, "_last_cert_terms", None)
    if _terms is not None:
        extra["cert_terms_hist"] = np.bincount(_terms, minlength=8).tolist()
    check_n = int(os.environ.get("HVQ_BENCH_CHECK", 5))
    if check_n:
        from hvq_tpu.models.oracle import search_oracle
        from hvq_tpu.utils.compare import compare_distances, recall_at_k
        from hvq_tpu.utils.formats import recompute_result_distances

        sub = type(qs)(
            qtype=qs.qtype[:check_n], v=qs.v[:check_n],
            l=qs.l[:check_n], r=qs.r[:check_n], V=qs.V[:check_n],
        )
        with timer.phase("oracle_check"):
            oids, odists = search_oracle(ds, sub)
        res = compare_distances(
            recompute_result_distances(ds, sub, ids[:check_n].astype(np.int64)),
            recompute_result_distances(ds, sub, oids.astype(np.int64)),
        )
        check_d = (
            dists[:check_n]
            if dists is not None
            else recompute_result_distances(
                ds, sub, ids[:check_n].astype(np.int64)
            )
        )
        extra["checked_queries"] = check_n
        extra["recall_at_100"] = round(
            recall_at_k(ids[:check_n], oids, check_d, odists), 6
        )
        extra["dist_check"] = res.status
        extra["max_dist_diff"] = res.max_abs_diff
    timer.report(stream=sys.stderr)
    log = os.environ.get("HVQ_BENCH_LOG")
    if log:
        # CHANGELOG-style perf-history row (reference CHANGELOG.md workflow)
        import datetime

        with open(log, "a") as f:
            f.write(
                f"| {datetime.date.today()} | {engine_name} "
                f"| D={n} Q={q} | {qps:.1f} QPS | {qps / baseline:.2f}× "
                f"| {extra.get('recall_at_100', '-')} "
                f"| {extra.get('dist_check', '-')} |\n"
            )
    print(
        json.dumps(
            {
                "metric": f"exact_hybrid_knn_qps_D{n}_Q{q}"
                + (
                    "_types" + "".join(map(str, types))
                    if types != (0, 1, 2, 3)
                    else ""
                ),
                "value": round(qps, 2),
                "unit": "queries/s",
                "vs_baseline": round(qps / baseline, 2),
                "baseline_qps": round(baseline, 2),
                "wall_s": round(wall, 3),
                "engine": engine_name,
                "device": str(jax.devices()[0]),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    # The tunneled backend can be transiently UNAVAILABLE (observed: a
    # multi-hour relay outage mid-round-2); a bounded outer retry keeps a
    # driver-scheduled bench from reporting nothing over a blip.
    for _attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 — textual by necessity
            txt = str(e).upper()
            if _attempt == 2 or "UNAVAILABLE" not in txt:
                raise
            print(
                f"backend unavailable (attempt {_attempt + 1}/3), "
                "retrying in 120 s",
                file=sys.stderr,
            )
            time.sleep(120)
