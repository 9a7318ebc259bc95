"""Benchmark runner: hybrid k-NN QPS on the real TPU chip.

Prints the official JSON line {"metric", "value", "unit", "vs_baseline", ...}
IMMEDIATELY after the timed search — a later failure (oracle check, relay
outage) can no longer erase the measurement (round-2 lesson: BENCH_r02.json
recorded rc=124/parsed=null because the whole run died before the single
print at the end). If the oracle check completes afterwards, an ENRICHED
superset line is printed; a driver parsing either the first or the last JSON
line gets a valid record.

Robustness layers (all measured against this environment's axon relay):

* the generated dataset/queries are CACHED on disk keyed by their config
  (``/tmp/hvq_data_cache``), so re-runs and fallback attempts skip the 66 s
  generate;
* the run is supervised: ``python bench.py`` re-execs itself as
  ``bench.py --attempt <engine>`` under a wall-clock budget and falls back
  to ``batched`` (few program shapes → bounded cold-compile time) if the
  default ``partitioned`` attempt exceeds its budget without printing;
* the oracle spot-check runs on a host thread OVERLAPPING warmup, pausable
  at query granularity so it never contends with the timed region (this
  host has ONE core — concurrent host work inflates QPS phases 30 %+);
* transient-backend retries sleep 20 s, not 120 s.

Default config is the reference's LARGE set (D=10^7, Q=4x10^4; CPU best
case 664 s on 6 threads => 15 QPS, BASELINE.md). Environment overrides:

  HVQ_BENCH_N        database rows        (default 10_000_000)
  HVQ_BENCH_Q        total queries        (default 40_000)
  HVQ_BENCH_ENGINE   engine name          (default "partitioned")
  HVQ_BENCH_BASELINE baseline QPS         (default computed from N)
  HVQ_BENCH_CATS     category count       (default 1000, contest-like)
  HVQ_BENCH_CHECK    oracle spot-check queries (default 5)
  HVQ_BENCH_CLUSTERS mixture clusters (0 = uniform reference distribution)
  HVQ_BENCH_DTYPE    "bf16" = low-precision fast mode (recall reported)
  HVQ_BENCH_SCAN_IMPL / HVQ_BENCH_DB_TILE / HVQ_BENCH_QB / HVQ_BENCH_PRECISION
  HVQ_BENCH_KPRIME   selection depth k' override
  HVQ_BENCH_LOG      markdown file to append a CHANGELOG-style row to
  HVQ_BENCH_BUDGET1 / HVQ_BENCH_BUDGET2   attempt wall budgets, seconds
  HVQ_BENCH_NO_FALLBACK=1                 single attempt, no engine ladder
  HVQ_BENCH_CACHE    dataset cache dir ("" disables caching)

Baseline QPS (reference, i5-8400 6C best case, BASELINE.md):
  D=10^4:  10^4 q / 0.66 s  = 15152 QPS   (report "Optimization #2")
  D=10^6:  10^4 q / 68.11 s =   147 QPS   (pptx chart5)
  D=10^7:  10^4 q / 664 s   =    15 QPS   (pptx chart6)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time


def _baseline_qps(n: int) -> float:
    if n >= 5_000_000:
        return 10_000 / 664.0
    if n >= 500_000:
        return 10_000 / 68.11
    return 10_000 / 0.66


def _config():
    n = int(os.environ.get("HVQ_BENCH_N", 10_000_000))
    q = int(os.environ.get("HVQ_BENCH_Q", 40_000))
    cats = int(os.environ.get("HVQ_BENCH_CATS", 1000))
    clusters = int(os.environ.get("HVQ_BENCH_CLUSTERS", 0)) or None
    types = tuple(
        int(t) for t in os.environ.get("HVQ_BENCH_TYPES", "0,1,2,3").split(",")
    )
    return n, q, cats, clusters, types


# --- dataset cache ---------------------------------------------------------

def _cache_dir() -> str | None:
    # /dev/shm, NOT /tmp: this image's disk reads at 36 MB/s, so a
    # disk-backed mmap cache made every cold build slower than the 66 s
    # regenerate it was meant to save (r3 postmortem: the permuted index
    # gather against the cold mmap cost >20 min). tmpfs is RAM: mmap loads
    # and gathers at memory speed and the cache still survives the
    # supervisor's process restarts.
    d = os.environ.get("HVQ_BENCH_CACHE", "/dev/shm/hvq_data_cache")
    return d or None


def _cache_key(n, q, cats, clusters, types) -> str:
    return (
        f"n{n}_q{q}_c{cats}_cl{clusters or 0}_"
        f"t{''.join(map(str, types))}_s0s1_v1"
    )


def _oracle_cache_path() -> str | None:
    root = _cache_dir()
    if not root:
        return None
    key = _cache_key(*_config())
    return os.path.join(root, key, "oracle.npz")


def load_or_generate(n, q, cats, clusters, types):
    """Generate-or-load the bench dataset/queries (host-only, no jax).

    Arrays are memory-mapped from the cache — the 4 GB large-set vector
    block loads in seconds from page cache instead of a 66 s regenerate,
    which matters twice: on every re-run of the bench, and for the
    supervised fallback attempt (which starts a fresh process).
    """
    import numpy as np

    from hvq_tpu.utils.formats import Dataset, QuerySet
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    root = _cache_dir()
    key = _cache_key(n, q, cats, clusters, types)
    d = os.path.join(root, key) if root else None
    if d and os.path.exists(os.path.join(d, "ok")):
        arr = {
            f: np.load(os.path.join(d, f + ".npy"), mmap_mode="r")
            for f in ("C", "T", "V", "qtype", "qv", "ql", "qr", "qV")
        }
        ds = Dataset(C=arr["C"], T=arr["T"], V=arr["V"])
        qs = QuerySet(
            qtype=arr["qtype"], v=arr["qv"], l=arr["ql"], r=arr["qr"],
            V=arr["qV"],
        )
        return ds, qs
    ds = generate_dataset(n, seed=0, categories=cats, clusters=clusters)
    qs = generate_queries(
        q, seed=1, categories=cats, clusters=clusters, centers_seed=0,
        types=types,
    )
    if d:
        tmp = d + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        for f, a in (
            ("C", ds.C), ("T", ds.T), ("V", ds.V), ("qtype", qs.qtype),
            ("qv", qs.v), ("ql", qs.l), ("qr", qs.r), ("qV", qs.V),
        ):
            np.save(os.path.join(tmp, f + ".npy"), a)
        open(os.path.join(tmp, "ok"), "w").close()
        try:
            os.rename(tmp, d)          # atomic publish; loser cleans up
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return ds, qs


# --- overlapped oracle check ----------------------------------------------

class OracleThread(threading.Thread):
    """Computes oracle results for the first ``check_n`` queries on a host
    thread, abortable at block granularity so the timed region never shares
    the single host core. Blocks of 8 queries run through the vectorized
    float64 oracle (models.oracle.search_oracle_batched — one BLAS matmul
    per database chunk), which made the r3 default of 5 checks affordable
    at 64 (VERDICT r3 #5b: the 9214-QPS artifact shipped with
    ``checked_queries: 3``)."""

    def __init__(self, ds, qs, check_n: int, cache_path: str | None = None):
        super().__init__(daemon=True)
        self.ds, self.qs, self.check_n = ds, qs, check_n
        self.abort = threading.Event()
        self.oids, self.odists = [], []
        # Disk-cached oracle rows (keyed by the dataset config): each
        # query costs a full host-NumPy scan (~15 s nominal, minutes on a
        # degraded host — the 9731-QPS artifact shipped without recall
        # fields because not one of 5 finished in 27 min). Computed once,
        # every later run gets its recall fields for free.
        self.cache_path = cache_path
        if cache_path and os.path.exists(cache_path):
            import numpy as np

            z = np.load(cache_path)
            m = min(int(z["ids"].shape[0]), check_n)
            self.oids = list(z["ids"][:m])
            self.odists = list(z["dists"][:m])

    def run(self):
        import numpy as np

        from hvq_tpu.models.oracle import search_oracle_batched

        qs = self.qs
        QB = 8
        # Resume from wherever a previous (aborted) run stopped: the
        # synchronous enrichment pass re-calls run() on the same object,
        # and restarting at 0 would DOUBLE-APPEND query 0 — misaligning
        # every later oracle row against the engine's results (seen live:
        # a correct first line, then an enriched line reporting recall
        # 2/3 + dist "different" purely from the off-by-one).
        while len(self.oids) < self.check_n:
            if self.abort.is_set():
                break       # fall through: partial progress still caches
            i = len(self.oids)
            j = min(i + QB, self.check_n)
            sub = type(qs)(
                qtype=qs.qtype[i:j], v=qs.v[i:j],
                l=qs.l[i:j], r=qs.r[i:j], V=qs.V[i:j],
            )
            oid, od = search_oracle_batched(self.ds, sub, qblock=QB)
            self.oids.extend(oid)
            self.odists.extend(od)
        if self.cache_path and self.oids:
            tmp = self.cache_path + f".tmp{os.getpid()}"
            np.savez(tmp, ids=np.stack(self.oids), dists=np.stack(self.odists))
            try:
                os.replace(tmp + ".npz", self.cache_path)
            except OSError:
                pass


def _check_fields(ds, qs, ids, dists, oracle: OracleThread):
    """Recall/dist-contract fields from however many oracle queries finished."""
    import numpy as np

    from hvq_tpu.utils.compare import compare_distances, recall_at_k
    from hvq_tpu.utils.formats import recompute_result_distances

    c = len(oracle.odists)
    if c == 0:
        return {}
    oids = np.stack(oracle.oids[:c])
    odists = np.stack(oracle.odists[:c])
    sub = type(qs)(
        qtype=qs.qtype[:c], v=qs.v[:c], l=qs.l[:c], r=qs.r[:c], V=qs.V[:c],
    )
    res = compare_distances(
        recompute_result_distances(ds, sub, ids[:c].astype(np.int64)),
        recompute_result_distances(ds, sub, oids.astype(np.int64)),
    )
    check_d = (
        dists[:c]
        if dists is not None
        else recompute_result_distances(ds, sub, ids[:c].astype(np.int64))
    )
    return {
        "checked_queries": c,
        "recall_at_100": round(recall_at_k(ids[:c], oids, check_d, odists), 6),
        "dist_check": res.status,
        "max_dist_diff": res.max_abs_diff,
    }


def _recompute_dist_chunked(ds, qs, ids, chunk: int = 2048):
    """Chunked .dist recompute (io.h:50-78 semantics) — the one-shot
    einsum gathers (M, k, 100) floats, 1.6 GB at Q=4·10⁴; 2048-query
    chunks keep the host peak ≈80 MB."""
    import numpy as np

    from hvq_tpu.utils.formats import recompute_result_distances

    ids = np.asarray(ids, dtype=np.int64)
    out = np.empty(ids.shape, np.float32)
    for s in range(0, ids.shape[0], chunk):
        e = min(s + chunk, ids.shape[0])
        sub = type(qs)(
            qtype=qs.qtype[s:e], v=qs.v[s:e], l=qs.l[s:e], r=qs.r[s:e],
            V=qs.V[s:e],
        )
        out[s:e] = recompute_result_distances(ds, sub, ids[s:e])
    return out


def _full_diff_fields(ds, qs, ids, engine_name, engine_kwargs, timer):
    """Full-population differential verification (VERDICT r4 #1).

    The reference never publishes a number whose every query wasn't
    cross-checked (run.sh:8-18 → compare_data.cpp:96-108 over complete
    .dist files). A host oracle over all queries is hours at D=10⁷, but an
    ENGINE-vs-ENGINE comparison is the reference's own strategy: re-answer
    the full query set through an independent code path (different engine,
    fp32 scan plane) and compare ALL recomputed .dist rows under 0.002.
    """
    import gc

    from hvq_tpu.models.registry import get_engine
    from hvq_tpu.utils.compare import compare_distances

    partner = "batched" if engine_name != "batched" else "partitioned"
    # Memory-driven partner selection: a whole-index fp32 batched partner
    # holds TWO full vector planes (scan + refine gather) plus the scan
    # program's temps — measured 16.1 GB total at D=10⁷ (arguments 9.66 G
    # + 6.19 G HLO temps) against 15.75 G HBM, an OOM no build-retry can
    # fix. Above the fit line the partner is the PagedEngine: fp32,
    # host-paged windows, bounded HBM by construction, and still an
    # independent code path (different engine, different scan plane).
    vec_bytes = int(ds.V.shape[0]) * int(ds.V.shape[1]) * 4
    if partner == "batched" and vec_bytes > 3.8e9:
        partner = "paged"
    kw = {
        k: v
        for k, v in engine_kwargs.items()
        if k not in ("scan_store", "time_view_max_bytes")
    }
    import inspect as _inspect

    kw = {
        k: v
        for k, v in kw.items()
        if k in _inspect.signature(get_engine(partner).__init__).parameters
    }
    gc.collect()                       # primary engine's HBM freed by caller
    # Back-to-back D=10⁷ index builds can still hit RESOURCE_EXHAUSTED
    # while the freed primary's buffers drain through the relay (the
    # kprime_cliff.py mechanism) — bounded retry instead of giving up.
    for att in range(3):
        try:
            with timer.phase("full_diff_build"):
                eng2 = get_engine(partner)(ds, **kw)
            break
        except Exception as e:  # noqa: BLE001
            if att == 2 or "RESOURCE_EXHAUSTED" not in repr(e):
                raise
            # name the pin: what device buffers are still alive?
            import jax

            live = jax.live_arrays()
            by = sum(a.nbytes for a in live)
            print(
                f"full_diff_build OOM (attempt {att + 1}): "
                f"{len(live)} live device arrays, {by / 1e9:.2f} GB",
                file=sys.stderr,
            )
            time.sleep(45.0)
            gc.collect()
    import inspect

    kw2 = (
        {"return_dists": False}
        if "return_dists" in inspect.signature(eng2.search).parameters
        else {}
    )
    with timer.phase("full_diff_search"):
        ids2, _ = eng2.search(qs, **kw2)
    del eng2
    gc.collect()
    with timer.phase("full_diff_compare"):
        d1 = _recompute_dist_chunked(ds, qs, ids)
        d2 = _recompute_dist_chunked(ds, qs, ids2)
        res = compare_distances(d1, d2)
    return {
        "full_diff": res.status,
        "full_diff_max": res.max_abs_diff,
        "full_diff_queries": int(ids.shape[0]),
        "full_diff_engines": [engine_name, f"{partner}_fp32"],
    }


# --- one measurement attempt ------------------------------------------------

def attempt(engine_name: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    if os.environ.get("HVQ_BENCH_PLATFORM"):
        # CPU smoke-testing: the image's sitecustomize registers the axon
        # plugin and pins JAX_PLATFORMS=axon; only the config update wins.
        jax.config.update("jax_platforms", os.environ["HVQ_BENCH_PLATFORM"])

    import numpy as np

    from hvq_tpu.models.registry import get_engine
    from hvq_tpu.utils.timing import PhaseTimer

    n, q, cats, clusters, types = _config()
    baseline = float(os.environ.get("HVQ_BENCH_BASELINE", _baseline_qps(n)))

    # First backend touch pays the relay/device initialization (measured
    # 300-900 s through this environment's tunnel). Start it NOW on a
    # thread so it overlaps the host-side generate/load.
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
        ds, qs = load_or_generate(n, q, cats, clusters, types)

    engine_kwargs = {}
    if os.environ.get("HVQ_BENCH_SCAN_IMPL"):
        engine_kwargs["scan_impl"] = os.environ["HVQ_BENCH_SCAN_IMPL"]
    if os.environ.get("HVQ_BENCH_DB_TILE"):
        engine_kwargs["db_tile"] = int(os.environ["HVQ_BENCH_DB_TILE"])
    if os.environ.get("HVQ_BENCH_QB"):
        engine_kwargs["query_batch"] = int(os.environ["HVQ_BENCH_QB"])
    if os.environ.get("HVQ_BENCH_PRECISION"):
        engine_kwargs["precision"] = os.environ["HVQ_BENCH_PRECISION"]
    if os.environ.get("HVQ_BENCH_KPRIME"):
        engine_kwargs["kprime"] = int(os.environ["HVQ_BENCH_KPRIME"])
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
    # "bf16" = certified bf16 scan plane + fp32 refine table. Default ON at
    # flagship scale: measured 8535 → 8987 QPS at D=10⁷ mixed (and exact,
    # max|dist-ref| = 0) vs fp32's 7962 (experiments/flagship_ab.py, r4);
    # at D≤10⁶ fp32 wins slightly (17451 vs 16986) and halving scan bytes
    # buys nothing, so the plane stays off below 4M rows.
    store_default = "bf16" if n >= 4_000_000 else "fp32"
    store = os.environ.get("HVQ_BENCH_STORE", store_default)
    if store != "fp32":
        engine_kwargs["scan_store"] = store
    if os.environ.get("HVQ_BENCH_DTYPE") == "bf16":
        import jax.numpy as jnp

        engine_kwargs["dtype"] = jnp.bfloat16
        engine_kwargs.setdefault("precision", "default")
    _init_t.join()                      # device ready; build = upload only
    if _cache_dir():
        # host sort products persist next to the dataset cache — a cold
        # partitioned build pays upload + device gather only (VERDICT r3 #5a)
        os.environ.setdefault(
            "HVQ_PERM_CACHE",
            os.path.join(_cache_dir(), _cache_key(*_config()), "perm.npz"),
        )
    with timer.phase("build"):
        engine = get_engine(engine_name)(ds, **engine_kwargs)
    if os.environ.get("HVQ_BENCH_RESILIENT", "1") != "0":
        # the tunneled runtime throws transient INTERNAL errors on long
        # compiles; bounded retries absorb them (utils.resilience)
        from hvq_tpu.utils.resilience import ResilientEngine

        engine = ResilientEngine(engine)

    # Oracle spot-check overlaps warmup on a host thread (see OracleThread).
    check_n = int(os.environ.get("HVQ_BENCH_CHECK", 64))
    oracle = OracleThread(ds, qs, check_n, _oracle_cache_path())
    cached_rows = len(oracle.odists)
    if check_n and cached_rows < check_n:
        oracle.start()

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
    # Warmup: compile all program shapes. The dispatch plan (group sizes)
    # depends on the full query count, so warm with the full set — the
    # second warm run is then a pure steady-state sanity pass.
    with timer.phase("warmup_compile"):
        engine.search(qs, **search_kw)
        engine.search(qs, **search_kw)  # second call = steady-state sanity

    # Quiesce the host before the timed region: this box has ONE core, and
    # a concurrent oracle query inflates the host-side phases 30 %+.
    # (``ident`` is None when the cache made starting the thread unnecessary
    # — joining an unstarted thread raises.)
    if check_n and oracle.ident is not None:
        with timer.phase("oracle_overlap_wait"):
            # With ≥2 rows already cached the official line has its recall
            # fields either way — don't spend minutes of the attempt budget
            # idling for the tail rows (they'll land in the cache next run).
            default_wait = 180 if cached_rows < 2 else 30
            oracle.join(
                timeout=float(
                    os.environ.get("HVQ_BENCH_ORACLE_WAIT", default_wait)
                )
            )
            if oracle.is_alive():
                oracle.abort.set()
                oracle.join(timeout=60)  # in-flight query drains in ≤ ~20 s

    # Host HW counters bracket the timed region like the reference's
    # PerfEvent around vec_query (src/test.cpp:82-92); the engine's
    # PhaseTimer records the in-search pack/enqueue/fetch/rerun split.
    from hvq_tpu.native import PerfCounters

    # Median of N timed searches: run-to-run relay variance is ±10-15%
    # (2× on degraded-host days) and a single sample let the best run
    # masquerade as "the" number (VERDICT r3 #5c). Each run gets its own
    # phase timer; the reported split belongs to the median run.
    n_runs = max(1, int(os.environ.get("HVQ_BENCH_RUNS", 3)))
    has_phases = "phases" in inspect.signature(base_search).parameters
    run_walls, run_timers = [], []
    with timer.phase("search"):
        with PerfCounters() as pc:
            for _ in range(n_runs):
                st = PhaseTimer()
                kw = dict(search_kw)
                if has_phases:
                    kw["phases"] = st
                t0 = time.perf_counter()
                ids, dists = engine.search(qs, **kw)
                run_walls.append(time.perf_counter() - t0)
                run_timers.append(st)
    med = int(np.argsort(run_walls)[len(run_walls) // 2])
    wall = run_walls[med]
    search_timer = run_timers[med]

    qps = q / wall
    extra = {}
    if n_runs > 1:
        extra["timed_runs"] = n_runs
        extra["run_qps"] = [round(q / w, 2) for w in run_walls]
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
                # the counter block brackets all n_runs timed searches
                extra["host_counters"][f"{name}_per_query"] = round(
                    rep[name] / max(q * n_runs, 1), 1
                )
    # Certificate forensics (HVQ_CERT_TERMS=1): histogram of per-query term
    # bitmasks (1 = bin saturation, 2 = level-2, 4 = k'-cut) from the timed
    # run — which term drives the rerun ladder at this config.
    _inner = getattr(engine, "engine", engine)
    _terms = getattr(_inner, "_last_cert_terms", None)
    if _terms is not None:
        extra["cert_terms_hist"] = np.bincount(_terms, minlength=8).tolist()

    record = {
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
        # Which scan implementation actually ran (auto-resolution lands on
        # the Mosaic pallas_v3 kernel on TPU) — the official artifact doubles
        # as the per-round Mosaic health check (VERDICT r2 #8).
        "scan_impl": getattr(
            getattr(engine, "engine", engine), "scan_impl", None
        ),
        "device": str(jax.devices()[0]),
        **extra,
    }
    # The official line, flushed the moment the measurement exists — any
    # later failure (oracle check, relay outage) can't erase it.
    record.update(_check_fields(ds, qs, ids, dists, oracle))
    print(json.dumps(record), flush=True)
    timer.report(stream=sys.stderr)

    if check_n and len(oracle.odists) < min(check_n, 2):
        # The overlapped oracle didn't finish even 2 queries (cold host or
        # aborted for the timed region): finish a couple synchronously and
        # print an ENRICHED superset line — last-line parsers pick it up.
        oracle.abort.clear()
        oracle.check_n = min(check_n, 2)
        with timer.phase("oracle_check"):
            oracle.run()                # synchronous, same thread object
        fields = _check_fields(ds, qs, ids, dists, oracle)
        if fields:
            record.update(fields)
            print(json.dumps(record), flush=True)

    if (
        os.environ.get("HVQ_BENCH_FULLDIFF", "1") != "0"
        and "dtype" not in engine_kwargs        # bf16 mode is approximate
    ):
        # Full-population cross-engine differential (reference run.sh:8-18
        # practice at bench scale). Failures here can't erase the official
        # line — it is already printed; a passing check prints an ENRICHED
        # superset line carrying full_diff over ALL queries.
        try:
            # release the primary engine's HBM: `engine` AND every local
            # that aliases the inner engine — `_inner` alone, and then
            # the `base_search` bound method (its __self__ IS the inner
            # engine), each pinned the whole D=10⁷ device index through
            # the partner build (both found via failed flagship
            # full_diff legs: RESOURCE_EXHAUSTED on the partner build
            # despite its bounded retry)
            del engine, _inner, _terms, base_search
            fields = _full_diff_fields(
                ds, qs, np.asarray(ids), engine_name, engine_kwargs, timer
            )
            record.update(fields)
            print(json.dumps(record), flush=True)
        except Exception as e:  # noqa: BLE001 — verification is best-effort
            print(f"full_diff failed: {e!r}", file=sys.stderr)

    log = os.environ.get("HVQ_BENCH_LOG")
    if log:
        # CHANGELOG-style perf-history row (reference CHANGELOG.md workflow)
        import datetime

        with open(log, "a") as f:
            f.write(
                f"| {datetime.date.today()} | {engine_name} "
                f"| D={n} Q={q} | {qps:.1f} QPS | {qps / baseline:.2f}× "
                f"| {record.get('recall_at_100', '-')} "
                f"| {record.get('dist_check', '-')} |\n"
            )


def _attempt_main(engine_name: str) -> None:
    # Bounded retries on transient backend unavailability: the tunneled
    # backend throws UNAVAILABLE over relay blips. Sleeps are SHORT — a
    # long sleep spends the supervisor's budget, and a real outage (r2: a
    # multi-hour one) won't heal in any sleep worth taking.
    for _attempt in range(3):
        try:
            attempt(engine_name)
            return
        except Exception as e:  # noqa: BLE001 — textual by necessity
            txt = str(e).upper()
            if _attempt == 2 or "UNAVAILABLE" not in txt:
                raise
            print(
                f"backend unavailable (attempt {_attempt + 1}/3), "
                "retrying in 20 s",
                file=sys.stderr,
            )
            time.sleep(20)


# --- supervisor --------------------------------------------------------------

def _run_supervised(engine_name: str, budget_s: float) -> bool:
    """One attempt subprocess under a wall budget; True once the JSON line
    is seen (the measurement exists — later child failures don't matter)."""
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--attempt", engine_name],
        stdout=subprocess.PIPE,
        text=True,
        env=env,
    )
    got_json = False
    deadline = time.monotonic() + budget_s

    def _reader():
        nonlocal got_json
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            if line.lstrip().startswith('{"metric"'):
                got_json = True

    rt = threading.Thread(target=_reader, daemon=True)
    rt.start()
    while proc.poll() is None and time.monotonic() < deadline:
        time.sleep(1.0)
    if proc.poll() is None:
        print(
            f"bench supervisor: engine={engine_name} exceeded its "
            f"{budget_s:.0f}s budget, killing attempt",
            file=sys.stderr,
        )
        proc.kill()
    proc.wait()
    rt.join(timeout=10)
    return got_json


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--attempt":
        _attempt_main(sys.argv[2])
        return

    # Pre-populate the dataset cache BEFORE any attempt so a killed first
    # attempt doesn't pay generation twice (host-only, no backend touch).
    n, q, cats, clusters, types = _config()
    if _cache_dir():
        load_or_generate(n, q, cats, clusters, types)

    primary = os.environ.get("HVQ_BENCH_ENGINE", "partitioned")
    ladder = [primary]
    if os.environ.get("HVQ_BENCH_NO_FALLBACK") != "1" and primary != "batched":
        # batched compiles O(log) program shapes vs partitioned's ~dozens —
        # the cold-cache insurance engine (round-2 postmortem, VERDICT §1).
        ladder.append("batched")
    budgets = [
        float(os.environ.get("HVQ_BENCH_BUDGET1", 2700)),
        float(os.environ.get("HVQ_BENCH_BUDGET2", 1800)),
    ]
    for engine_name, budget in zip(ladder, budgets):
        if _run_supervised(engine_name, budget):
            return
        print(
            f"bench supervisor: engine={engine_name} produced no "
            "measurement, falling back",
            file=sys.stderr,
        )
    sys.exit(1)


if __name__ == "__main__":
    main()
