"""Partitioned-engine bucket policy on the MIXED workload (real chip).

Hypothesis: mid-width buckets (32768/262144-row slices, one per query)
are slower than just scanning densely — the dense batch amortizes over
1024 queries while a routed slice pays per query. Compare bucket sets.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/route_buckets.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("RB_N", 1_000_000))
Q = int(os.environ.get("RB_Q", 10_000))


def main():
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    qs_mixed = generate_queries(Q, seed=1, categories=1000, centers_seed=0)
    qs_sel = generate_queries(
        Q, seed=1, categories=1000, centers_seed=0, types=(1, 3)
    )
    index = None
    for buckets in ((4096, 32768, 262144), (4096, 32768), (4096,)):
        eng = PartitionedEngine(ds, route_buckets=buckets, index=index)
        index = eng.index          # reuse the built views across configs
        for name, qs in (("mixed", qs_mixed), ("sel13", qs_sel)):
            eng.search(qs, return_dists=False)       # warm compiles
            t0 = time.perf_counter()
            ids, _ = eng.search(qs, return_dists=False)
            wall = time.perf_counter() - t0
            print(f"buckets={buckets} {name}: {Q/wall:8.0f} QPS "
                  f"({wall:.3f} s)", flush=True)


if __name__ == "__main__":
    main()
