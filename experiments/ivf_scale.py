"""IVF at scale: D=10⁷ clustered, recall + QPS vs the dense batched scan.

VERDICT r1 weak #3: IVF was recall-gated only at n=20k. This measures the
real claim at the large set on clustered data (the regime ANN indexes are
for; uniform i.i.d. vectors have no neighbor structure — documented worst
case). Workload is vector-only (type 0): with mixed predicates the
selectivity router sends most filtered queries to the exact fallback by
design, so the approximate-mode claim is about unfiltered search.

Reports QPS (fetch-timed, the engine's own host-array return) and
recall@100 against an oracle spot-check, per nprobe.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/ivf_scale.py
"""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np  # noqa: E402

from hvq_tpu.models.ivf import IVFEngine  # noqa: E402
from hvq_tpu.models.oracle import search_oracle  # noqa: E402
from hvq_tpu.utils.compare import recall_at_k  # noqa: E402
from hvq_tpu.utils.generators import (  # noqa: E402
    generate_dataset,
    generate_queries,
)
from hvq_tpu.utils.timing import PhaseTimer  # noqa: E402

N = int(os.environ.get("IV_N", 10_000_000))
Q = int(os.environ.get("IV_Q", 4096))
CLUSTERS = int(os.environ.get("IV_CLUSTERS", 1000))
CATS = int(os.environ.get("IV_CATS", 1000))
CHECK = int(os.environ.get("IV_CHECK", 64))
CAP = int(os.environ.get("IV_CAP", 1024))
B = int(os.environ.get("IV_B", 1024))


def main():
    timer = PhaseTimer()
    with timer.phase("generate"):
        ds = generate_dataset(N, seed=0, categories=CATS, clusters=CLUSTERS)
        qs = generate_queries(
            Q, seed=1, categories=CATS, clusters=CLUSTERS, centers_seed=0,
            types=(0,),
        )
    with timer.phase("build"):
        eng = IVFEngine(ds, cap=CAP, nprobe=8, query_batch=B)
    print(
        f"rows={N} clusters={CLUSTERS} buckets={eng.index.num_buckets} "
        f"cap={CAP} B={B} Q={Q}",
        flush=True,
    )
    sub = type(qs)(
        qtype=qs.qtype[:CHECK], v=qs.v[:CHECK],
        l=qs.l[:CHECK], r=qs.r[:CHECK], V=qs.V[:CHECK],
    )
    with timer.phase("oracle_check"):
        oids, odists = search_oracle(ds, sub)
    for nprobe in (4, 8, 16, 32):
        eng.nprobe = min(nprobe, eng.index.num_buckets)
        eng.search(qs)                       # warm/compile this nprobe
        t0 = time.perf_counter()
        ids, dists = eng.search(qs)
        wall = time.perf_counter() - t0
        rec = recall_at_k(ids[:CHECK], oids, dists[:CHECK], odists)
        print(
            f"nprobe={nprobe:3d}  {Q / wall:8.0f} QPS  wall={wall:6.2f}s  "
            f"recall@100={rec:.4f}",
            flush=True,
        )
    timer.report()


if __name__ == "__main__":
    main()
