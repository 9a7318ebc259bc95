"""Quantify per-dispatch overhead and steady-state batch cost on the chip.

Times the batched engine's single-batch path vs grouped dispatch on one
dataset in one process (no recompiles between measurements). Run on TPU:
    python experiments/dispatch_bench.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

import numpy as np  # noqa: E402

from hvq_tpu.models.batched import BatchedEngine  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402

N = 1_000_000
B = 256

ds = generate_dataset(N, seed=0, categories=1000)
qs1 = generate_queries(B, seed=1, categories=1000)          # 1 batch
qs8 = generate_queries(8 * B, seed=1, categories=1000)      # 8 batches


def timed(label, engine, qs, iters=3):
    engine.search(qs)  # warm/compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        engine.search(qs)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:8.1f} ms  ({qs.m/best:8.0f} QPS)", flush=True)
    return best


for g in (1, 8):
    eng = BatchedEngine(ds, dispatch_group=g)
    t1 = timed(f"G={g} single batch ({B} q)", eng, qs1)
    t8 = timed(f"G={g} eight batches ({8*B} q)", eng, qs8)
    per_batch = (t8 - t1) / 7
    print(f"   => marginal per-batch {per_batch*1e3:.1f} ms; "
          f"fixed overhead ≈ {(t1 - per_batch)*1e3:.1f} ms", flush=True)
