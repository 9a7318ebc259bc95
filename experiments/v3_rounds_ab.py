"""Shallower bin rounds + rerun-ladder absorption at flagship scale.

VERDICT r4 #6(b): the v3 kernel's gap to its VMEM roofline is the R
rounds + mask + packing that make the scan certified-exact; rounds cost
~1-1.5 ms/batch each at D=10⁶. R=1 is UNSOUND under the certificate (the
round-R kept minima are the evidence a bin conceals nothing better; with
R=1 every bin holding a top-k row sits below threshold, so every query
flags — a 100% "rerun ladder" is just the slow path). R=2 is the sound
shallow point: at D=10⁷/k'=240 the loss-driven pick is R=3 only because
k' widened for the bf16 plane's k'-cut slack — the FLAG driver is the
~k≈100 candidates below threshold, not k', so R=2's ~6% flag rate
(batched.py docstring, measured r4) is absorbable by the compacted
ladder while every batch saves a full round.

A/B under the shipped flagship config (partitioned, bf16 plane, k'=240,
D=10⁷ mixed, M=8192): bin_top 3 (shipping) vs 2 vs 4, same data, same
session, rerun-rate and phase split reported.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/v3_rounds_ab.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
os.environ.setdefault("HVQ_CERT_TERMS", "1")

N = int(os.environ.get("VRA_N", 10_000_000))
M = int(os.environ.get("VRA_M", 8192))
RUNS = int(os.environ.get("VRA_RUNS", 3))
TOPS = tuple(int(x) for x in os.environ.get("VRA_TOPS", "3,2,4").split(","))


def main():
    import gc

    from hvq_tpu.index.partition import PartitionedIndex
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries
    from hvq_tpu.utils.timing import PhaseTimer

    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(M, seed=7, categories=1000, centers_seed=0)
    # ONE device index shared by every bin_top (bin_top is scan-side only;
    # a per-engine rebuild both wastes minutes and OOMs the chip while the
    # previous engine's buffers drain)
    index = PartitionedIndex.build(ds, db_tile=16384, scan_store="bf16")

    for bt in TOPS:
        gc.collect()
        eng = PartitionedEngine(ds, index=index, bin_top=bt)
        eng.search(qs, return_dists=False)          # warm
        eng.search(qs, return_dists=False)
        walls, flags = [], []
        timers = []
        for _ in range(RUNS):
            ph = PhaseTimer()
            t0 = time.perf_counter()
            eng.search(qs, return_dists=False, phases=ph)
            walls.append(time.perf_counter() - t0)
            timers.append(ph)
            terms = getattr(eng, "_last_cert_terms", None)
            flags.append(int((terms != 0).sum()) if terms is not None else -1)
        med = int(np.argsort(walls)[len(walls) // 2])
        w = walls[med]
        split = {
            k.removeprefix("search/"): round(v * 1e3)
            for k, v in sorted(timers[med].totals.items())
        }
        print(
            f"bin_top={bt}: {M/w:7.0f} QPS ({1e3*w:.0f} ms; "
            f"runs {[f'{M/x:.0f}' for x in walls]}; "
            f"flagged {flags[med]}/{M}; phases_ms {split})",
            flush=True,
        )
        del eng


if __name__ == "__main__":
    main()
