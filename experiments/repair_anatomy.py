"""In-program bin-repair A/B at a chosen scale (chip-required).

Round-2 methodology record: per config this measures the default bench
workload three ways — repair OFF (the round-1 ladder), repair ON ungated,
and repair ON with the provisional-threshold gather gate — and prints the
QPS + phase splits plus the HVQ_CERT_TERMS forensics histogram for the
OFF run (which certificate term fires).

Round-2 measured results (clean runs, no concurrent host load — the
1-core host inflates phases 30%+ under pytest contention):

    D=10⁷ Q=4·10⁴ mixed:  off 7364-7964 (rerun 637-799 ms, 1224 suspects
                          ALL bin-term) / ungated 8253 / gated 7474
    D=10⁶ Q=10⁴  mixed:  off 18734 (rerun 46 ms) / ungated 18719
                          (repair free) / gated ~18.1k

The gate LOSES at scale: making the gather indices depend on the level-2
stream serializes the repair gather behind the top-k tail it otherwise
overlaps (see CHANGELOG.md).

    PYTHONPATH=/root/repo:/root/.axon_site \
        RA_N=10000000 RA_Q=40000 python experiments/repair_anatomy.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("RA_N", 1_000_000))
Q = int(os.environ.get("RA_Q", 10_000))


def run_one(ds, qs, label, **kw):
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.utils.timing import PhaseTimer

    eng = PartitionedEngine(ds, **kw)
    eng.search(qs, return_dists=False)          # warm all program shapes
    t = PhaseTimer()
    t0 = time.perf_counter()
    eng.search(qs, return_dists=False, phases=t)
    wall = time.perf_counter() - t0
    phases = {
        k.removeprefix("search/"): round(v * 1e3, 1)
        for k, v in sorted(t.totals.items())
    }
    print(f"{label}: {Q / wall:.0f} QPS  wall {wall:.3f}s  {phases}")
    terms = getattr(eng, "_last_cert_terms", None)
    if terms is not None:
        print(f"{label}: cert terms hist {np.bincount(terms, minlength=8)}")
    del eng


def main():
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(Q, seed=1, categories=1000, centers_seed=0)
    # forensics on the OFF run: which term fires (1=bin, 2=L2, 4=k'-cut)
    os.environ["HVQ_CERT_TERMS"] = "1"
    run_one(ds, qs, "repair OFF ", repair_bins=0)
    os.environ["HVQ_CERT_TERMS"] = ""
    run_one(ds, qs, "repair ON  ", repair_bins=4)
    run_one(ds, qs, "repair GATE", repair_bins=4, repair_gate=True)


if __name__ == "__main__":
    main()
