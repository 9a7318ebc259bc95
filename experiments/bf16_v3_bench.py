"""On-chip A/B: xla_packed fp32 vs bf16 scan plane vs pallas_v3 kernels.

Round-3 measurement for VERDICT tasks 2 (bf16-storage certified selection)
and the epilogue gap (weak #2). Protocol follows DESIGN.md §6: grouped
dispatch, fetch-based timing (block_until_ready does not block through the
relay), distinct query batches per repetition to defeat same-args caching.

Run: python experiments/bf16_v3_bench.py [n_rows] [B]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.models.batched import BatchedEngine, pack_query_block  # noqa: E402
from hvq_tpu.models import common  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402


def run_config(tag, ds, qs, reps=3, **kw):
    import jax.numpy as jnp

    eng = BatchedEngine(ds, **kw)
    B = eng.query_batch
    m = qs.m
    out = {}
    t_build = time.perf_counter()
    # one warm pass (compiles); measure subsequent full-set passes
    ids, _ = eng.search(qs, return_dists=False)
    out["warm_s"] = round(time.perf_counter() - t_build, 1)
    walls = []
    for r in range(reps):
        # rotate the query set so the relay's same-args cache can't serve
        perm = np.roll(np.arange(m), r * B)
        qs_r = type(qs)(
            qtype=qs.qtype[perm], v=qs.v[perm], l=qs.l[perm],
            r=qs.r[perm], V=qs.V[perm],
        )
        t0 = time.perf_counter()
        eng.search(qs_r, return_dists=False)
        walls.append(time.perf_counter() - t0)
    w = min(walls)
    out.update(
        tag=tag, wall_s=round(w, 3), qps=round(m / w, 1),
        walls=[round(x, 3) for x in walls],
        bin_top=eng.bin_top, kprime=eng.kprime,
        certified=eng.certified,
    )
    print(out, flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    m = 8 * B
    ds = generate_dataset(n, seed=0, categories=1000)
    qs = generate_queries(m, seed=1, categories=1000)
    print(f"n={n} m={m} B={B} device={jax.devices()[0]}", flush=True)

    run_config("fp32 xla_packed", ds, qs, query_batch=B,
               scan_impl="xla_packed")
    run_config("bf16 xla_packed", ds, qs, query_batch=B,
               scan_impl="xla_packed", scan_store="bf16")
    run_config("fp32 pallas_v3", ds, qs, query_batch=B,
               scan_impl="pallas_v3", interpret=False)
    run_config("bf16 pallas_v3", ds, qs, query_batch=B,
               scan_impl="pallas_v3", scan_store="bf16", interpret=False)


if __name__ == "__main__":
    main()
