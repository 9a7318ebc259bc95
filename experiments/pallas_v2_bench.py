"""fused_packed_scan_v2 (manual 3-pass bf16 Mosaic kernel) vs the XLA scan.

Kernel v1 lost everywhere it ran (DESIGN §3) — with a likely cause found
in round 2: Mosaic's dot supports only DEFAULT/HIGHEST, so v1's HIGH
request silently ran the 6-pass fp32 emulation. v2 expresses the 3-pass
bf16 algorithm manually (hi/lo planes split in VMEM) and B-subtiles the
grid. Fetch-timed, distinct query groups (group_throughput protocol).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/pallas_v2_bench.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("PV_B", 1024))
G = int(os.environ.get("PV_G", 4))
NROWS = int(os.environ.get("PV_ROWS", 122 * 8192))
REPS = int(os.environ.get("PV_REPS", 3))

from hvq_tpu.ops.pallas_scan import (  # noqa: E402
    deferred_packed_scan_xla,
    fused_packed_scan_v2,
)


def build(kind, db_tile=8192, b_block=256, bin_top=2):
    def one_batch(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        if kind == "pallas_v2":
            d_out, p_out = fused_packed_scan_v2(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=db_tile, bin_top=bin_top, b_block=b_block,
            )
        else:
            d_out, p_out = deferred_packed_scan_xla(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=db_tile, bin_top=bin_top,
                precision=jax.lax.Precision.HIGH,
                reduce_impl=kind,
            )
        return (
            jnp.sum(jnp.where(jnp.isfinite(d_out), d_out, 0.0))
            + jnp.sum(p_out).astype(jnp.float32)
        )

    def group(db, qVg, ac, v, at, l, r, sn):
        def gstep(_, qV):
            return None, one_batch(db, qV, ac, v, at, l, r, sn)

        _, sums = jax.lax.scan(gstep, None, qVg)
        return jnp.sum(sums)

    return jax.jit(group)


def main():
    print(f"device: {jax.devices()[0]} rows={NROWS} B={B} G={G}", flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + REPS + 1)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qGs = [jax.random.normal(k, (G, B, 128), jnp.float32) for k in kq]
    kb = jax.random.split(jax.random.PRNGKey(9), 5)
    ac = jax.random.uniform(kb[0], (B,)) < 0.5
    at = jax.random.uniform(kb[1], (B,)) < 0.5
    v = jnp.floor(jax.random.uniform(kb[2], (B,), maxval=1000.0))
    l = jax.random.uniform(kb[3], (B,), minval=-3.0, maxval=0.0)
    r = jax.random.uniform(kb[4], (B,), minval=0.0, maxval=3.0)
    sn = jnp.int32(NROWS)
    np.asarray(jnp.sum(Vp))
    GB = NROWS * 512 / 1e9

    def timeit(name, f):
        t0 = time.perf_counter()
        np.asarray(f(db, qGs[0], ac, v, at, l, r, sn))
        first = time.perf_counter() - t0
        ts = []
        for i in range(1, REPS + 1):
            t0 = time.perf_counter()
            np.asarray(f(db, qGs[i], ac, v, at, l, r, sn))
            ts.append(time.perf_counter() - t0)
        per_b = min(ts) / G
        print(
            f"{name:36s} {per_b * 1e3:7.2f} ms/batch {GB / per_b:6.1f} GB/s "
            f"{B / per_b:8.0f} QPS  walls={[f'{t*1e3:.0f}' for t in ts]} "
            f"(first {first:.0f}s)",
            flush=True,
        )

    specs = [
        ("pallas_v2 Dt=8k bb=256", build("pallas_v2", b_block=256)),
        ("pallas_v2 Dt=8k bb=512", build("pallas_v2", b_block=512)),
        ("pallas_v2 Dt=16k bb=256", build("pallas_v2", 16384, 256)),
    ]
    for name, f in specs:
        try:
            timeit(name, f)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
