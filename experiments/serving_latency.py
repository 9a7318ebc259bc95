"""Serving-shaped latency: p50/p99 per query at B in {1, 16} (real chip).

VERDICT r4 #7: every published number is throughput at B >= 256; the
reference's 66 ms/query large-set figure IS a latency row (pptx chart6) —
this script produces the comparable row: per-call wall of
``engine.search`` on single queries and 16-query micro-batches, for

  * the dense engine (batched, the type-0 floor: every call scans all N),
  * the routed engine (partitioned) on the SAME mixed stream (selective
    queries read only their category partition / time window), and

reports p50 / p95 / p99 / max plus how many calls took a certificate
rerun (the ladder's extra host round trip — the latency-relevant tail the
repair demotion traded away; models/batched.py docstring).

    PYTHONPATH=/root/repo python experiments/serving_latency.py
    SL_N=10000000 SL_CALLS=100 PYTHONPATH=/root/repo python ...
"""
import gc
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("SL_N", 1_000_000))
CALLS = int(os.environ.get("SL_CALLS", 200))
ENGINES = os.environ.get("SL_ENGINES", "batched,partitioned").split(",")
# serving-standard shape warmup: run this many untimed calls (disjoint
# query stream) before timing, so the routed engine's per-dispatch-plan
# program shapes are compiled at "deploy" rather than inside the p99
# (measured: cold shapes cost ~7 s each through the remote compiler)
WARM = int(os.environ.get("SL_WARM", 0))

os.environ.setdefault("HVQ_CERT_TERMS", "1")


def one_query(qs, i):
    return type(qs)(
        qtype=qs.qtype[i : i + 1], v=qs.v[i : i + 1],
        l=qs.l[i : i + 1], r=qs.r[i : i + 1], V=qs.V[i : i + 1],
    )


def sub(qs, i, j):
    return type(qs)(
        qtype=qs.qtype[i:j], v=qs.v[i:j], l=qs.l[i:j], r=qs.r[i:j],
        V=qs.V[i:j],
    )


def stats(tag, walls_ms, reruns):
    w = np.sort(np.asarray(walls_ms))
    print(
        f"{tag}: p50 {w[int(0.50 * (len(w) - 1))]:7.2f} | "
        f"p95 {w[int(0.95 * (len(w) - 1))]:7.2f} | "
        f"p99 {w[int(0.99 * (len(w) - 1))]:7.2f} | "
        f"max {w[-1]:7.2f} ms | rerun calls {reruns}/{len(w)}",
        flush=True,
    )


def main():
    from hvq_tpu.models.registry import get_engine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(
        max((CALLS + WARM + 3) * 16, 2048), seed=11, categories=1000,
        centers_seed=0,
    )
    store = {"scan_store": "bf16"} if N >= 4_000_000 else {}

    for name in ENGINES:
        # query_batch=16 — the serving-shaped program (a single query pads
        # to 16; B=1 programs hit Mosaic tiling minima and buy nothing)
        eng = get_engine(name)(ds, query_batch=16, **store)
        # warm every program shape the calls below can hit, incl. the
        # rerun ladder's pow-2 rungs (a cold ladder rung is a compile,
        # not a latency datum)
        eng.search(sub(qs, 0, 16), return_dists=False)
        eng.search(one_query(qs, 0), return_dists=False)

        for B in (1, 16):
            base = 16 * (2 + CALLS)  # disjoint from the timed stream
            if WARM and B == 1:
                # the routed engine's single-query plan shape depends on
                # the query TYPE (type-2 wide windows compile their own
                # program); a type the warmup never saw is a multi-second
                # cold compile inside the timed stream's max — warm one
                # query of EACH type first
                for t in range(4):
                    hits = np.flatnonzero(np.asarray(qs.qtype[base:]) == t)
                    if hits.size:
                        eng.search(one_query(qs, base + int(hits[0])),
                                   return_dists=False)
            for w in range(WARM):
                qw = (
                    one_query(qs, base + w)
                    if B == 1
                    else sub(qs, base + 16 * w, base + 16 * (w + 1))
                )
                eng.search(qw, return_dists=False)
            walls, reruns = [], 0
            for c in range(CALLS):
                q1 = (
                    one_query(qs, 16 + c)
                    if B == 1
                    else sub(qs, 16 * (1 + c), 16 * (2 + c))
                )
                t0 = time.perf_counter()
                eng.search(q1, return_dists=False)
                walls.append(1e3 * (time.perf_counter() - t0))
                terms = getattr(eng, "_last_cert_terms", None)
                if terms is not None and (terms != 0).any():
                    reruns += 1
            stats(f"{name:12s} N={N} B={B:2d}", walls, reruns)
        # at N=10^7 a second engine's index build OOMs the chip while the
        # first engine's buffers drain (the kprime_cliff.py mechanism) —
        # free eagerly, and prefer one engine per process at that scale
        del eng
        gc.collect()


if __name__ == "__main__":
    main()
