"""IVF vs dense in the low-batch / low-latency regime (VERDICT r2 #4).

Dense amortizes the whole database over the query batch, so at B ≤ 16 its
per-query cost explodes (the full scan is paid by a handful of queries).
IVF's probed-union work scales with nprobe·B instead — this is the regime
it exists for. Measures steady-state QPS at small B for both engines plus
recall vs the oracle on a spot-check.

Run: python experiments/ivf_lowbatch.py [n_rows] [batch]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.models.batched import BatchedEngine  # noqa: E402
from hvq_tpu.models.ivf import IVFEngine  # noqa: E402
from hvq_tpu.models.oracle import search_oracle  # noqa: E402
from hvq_tpu.utils.compare import recall_at_k  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402


def measure(tag, eng, qs, B, reps=4):
    m = qs.m
    t0 = time.perf_counter()
    eng.search(qs, return_dists=False)
    warm = time.perf_counter() - t0
    walls = []
    for r in range(reps):
        perm = np.roll(np.arange(m), (r + 1) * B)
        qs_r = type(qs)(qtype=qs.qtype[perm], v=qs.v[perm], l=qs.l[perm],
                        r=qs.r[perm], V=qs.V[perm])
        t0 = time.perf_counter()
        eng.search(qs_r, return_dists=False)
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    print({"tag": tag, "B": B, "qps": round(m / w, 1),
           "wall_s": round(w, 3), "warm_s": round(warm, 1),
           "walls": [round(x, 3) for x in walls]}, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    m = 16 * B                     # a short low-latency stream
    # clustered data: the regime ANN indexes exist for (uniform i.i.d. has
    # no neighbor structure — documented worst case, models/ivf.py)
    ds = generate_dataset(n, seed=0, categories=100, clusters=256)
    qs = generate_queries(m, seed=1, categories=100, clusters=256,
                          centers_seed=0, types=(0,))
    print(f"n={n} m={m} B={B} device={jax.devices()[0]}", flush=True)

    dense = BatchedEngine(ds, query_batch=B, scan_impl="xla_packed",
                          dispatch_group=32)
    measure("dense xla_packed", dense, qs, B)

    for nprobe in (8, 16, 32):
        ivf = IVFEngine(ds, cap=1024, nprobe=nprobe, query_batch=B)
        measure(f"ivf nprobe={nprobe}", ivf, qs, B)
        ids, dists = ivf.search(qs)
        c = min(m, 64)
        sub = type(qs)(qtype=qs.qtype[:c], v=qs.v[:c], l=qs.l[:c],
                       r=qs.r[:c], V=qs.V[:c])
        oids, odists = search_oracle(ds, sub)
        rec = recall_at_k(ids[:c], oids, dists[:c], odists)
        print({"tag": f"ivf nprobe={nprobe}", "recall_at_100": round(rec, 5)},
              flush=True)


if __name__ == "__main__":
    main()
