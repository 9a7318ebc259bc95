"""Engine-tail anatomy + bf16-plane k' sweep (VERDICT r3 #1/#2).

v3_anatomy measured the v3 KERNEL at 16.1 ms/batch (fp32) / 13.2 (bf16
plane) at D=10⁶ B=1024 — but the engine end-to-end costs ~60 ms/batch, so
~3/4 of the batch is the post-scan tail (level-2 reduce, candidate top-k,
in-program repair, finalize gather, bundling, dispatch/fetch machinery).
This measures the REAL engine subtractively:

  * default v3           (level2 on, repair 4)
  * repair_bins=0        (tail minus the repair gather + widened refine)
  * level2 off           (tail with plain lax.top_k over the stream)
  * both off
  * xla_packed reference
  * bf16 plane at kprime 128 / 192 / 256 (the r3 default 256 is why
    bf16+v3 measured slower; the sweep finds where the k'-cut flag rate
    starts paying rerun walls — phases show rerun ms directly)

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/v3_tail_sweep.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.models.batched import BatchedEngine  # noqa: E402
from hvq_tpu.models.device_db import DeviceDB  # noqa: E402
from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402
from hvq_tpu.utils.timing import PhaseTimer  # noqa: E402

N = int(os.environ.get("V3T_N", 1_000_000))
M = int(os.environ.get("V3T_M", 8192))
REPS = int(os.environ.get("V3T_REPS", 3))


def main():
    print(f"device: {jax.devices()[0]} N={N} M={M}", flush=True)
    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(M, seed=1, categories=1000)
    db32 = DeviceDB.from_dataset(ds, db_tile=16384)
    db16 = DeviceDB.from_dataset(ds, db_tile=16384, scan_store="bf16")

    def timeit(name, eng):
        eng.search(qs, return_dists=False)          # compile + warm
        ts, ph = [], None
        for _ in range(REPS):
            ph = PhaseTimer()
            t0 = time.perf_counter()
            eng.search(qs, return_dists=False, phases=ph)
            ts.append(time.perf_counter() - t0)
        w = sorted(ts)[len(ts) // 2]
        split = {k.removeprefix("search/"): round(v * 1e3)
                 for k, v in sorted(ph.totals.items())}
        print(f"{name:34s} {M / w:8.0f} QPS  {w / (M / 1024) * 1e3:6.1f} "
              f"ms/batch  walls={[f'{t:.2f}' for t in ts]} {split}",
              flush=True)

    specs = [
        ("v3 default", dict(device_db=db32)),
        ("v3 repair=0", dict(device_db=db32, repair_bins=0)),
        ("v3 level2 off", dict(device_db=db32, l2_min_w=1 << 30)),
        ("v3 repair=0 level2 off",
         dict(device_db=db32, repair_bins=0, l2_min_w=1 << 30)),
        ("xla_packed default",
         dict(device_db=db32, scan_impl="xla_packed")),
        ("v3 bf16 plane k'=256 (r3 dflt)", dict(device_db=db16)),
        ("v3 bf16 plane k'=192", dict(device_db=db16, kprime=192)),
        ("v3 bf16 plane k'=128", dict(device_db=db16, kprime=128)),
    ]
    for name, kw in specs:
        try:
            timeit(name, BatchedEngine(ds, scan_impl=kw.pop("scan_impl", "pallas_v3"),
                                       db_tile=16384, **kw))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
