"""Flagship tuning sweep on the shipped r4 config (bf16 plane, repair=0).

The r4 one-session headline table (/tmp/bench_log_r4.md) left two open
questions at D=10⁷ mixed:

* partitioned_sharded on ONE device measured 11221 QPS vs partitioned's
  10374 in the same session — is the mesh path genuinely faster single-chip
  (different dispatch structure: per-shard v3 inside shard_map) or was that
  relay variance?
* the remaining engine knobs (query_batch, kprime, dispatch_group) were
  last swept under r2's fp32+repair config; the shipped config changed
  (bf16 plane, repair_bins=0), so the old negatives (query_batch=2048,
  CHANGELOG r2) need a re-test under the new regime.

Every variant's distances are differentially compared against the shipped
default under the 0.002 contract (reference: src/compare_data.cpp:5).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/flagship_tune.py
Env:  FT_N (default 10_000_000), FT_M (8192), FT_REPS (3)
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

N = int(os.environ.get("FT_N", 10_000_000))
M = int(os.environ.get("FT_M", 8192))
REPS = int(os.environ.get("FT_REPS", 3))
CACHE = "/dev/shm/hvq_data_cache/n10000000_q40000_c1000_cl0_t0123_s0s1_v1"
if os.path.exists(os.path.join(CACHE, "perm.npz")):
    os.environ.setdefault("HVQ_PERM_CACHE", os.path.join(CACHE, "perm.npz"))


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
        print(f"{name:36s} {M / w:8.0f} QPS  max|dist-ref|={diff:.4g}  "
              f"walls={[f'{t:.2f}' for t in ts]} {split}", flush=True)

    t0 = time.perf_counter()
    idx = PartitionedIndex.build(ds, db_tile=16384, scan_store="bf16")
    print(f"[bf16 index built in {time.perf_counter() - t0:.0f}s]", flush=True)
    for name, kw in [
        ("bf16 shipped default (B=1024)", {}),
        ("bf16 B=2048", dict(query_batch=2048)),
        ("bf16 k'=208", dict(kprime=208)),
        ("bf16 k'=224", dict(kprime=224)),
        ("bf16 k'=240", dict(kprime=240)),
        ("bf16 dispatch_group=16", dict(dispatch_group=16)),
    ]:
        try:
            timeit(name, PartitionedEngine(ds, scan_impl="pallas_v3",
                                           index=idx, **kw))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        gc.collect()
    del idx
    gc.collect()

    # The mesh path on the single real chip: its own (sharded) index build.
    try:
        from hvq_tpu.models.partitioned_sharded import ShardedPartitionedEngine
        t0 = time.perf_counter()
        eng = ShardedPartitionedEngine(ds)
        print(f"[sharded index built in {time.perf_counter() - t0:.0f}s]",
              flush=True)
        timeit("partitioned_sharded (1 device)", eng)
    except Exception as e:  # noqa: BLE001
        print(f"partitioned_sharded: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
