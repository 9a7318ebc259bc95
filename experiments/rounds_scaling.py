"""How does the packed scan's cost scale with bin rounds R?

If each round re-reads the full (B, Dt) packed tile from HBM/VMEM, cost
grows ~linearly in R and a hierarchical sub-min pass has real headroom;
if XLA keeps the tile resident across rounds, R is nearly free and the
scan is bound elsewhere. R=1 is lossy — this probe only times.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/rounds_scaling.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("RS_B", 1024))
NROWS = 122 * 8192
REPS = 3

from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla


def build(R):
    def scan(db, qV):
        Vp, C, T, dn, oid = db
        ac = jnp.zeros((B,), bool)
        at = jnp.zeros((B,), bool)
        v = jnp.full((B,), -1.0)
        l = jnp.full((B,), -1.0)
        r = jnp.full((B,), -1.0)
        out_s, out_i = deferred_packed_scan_xla(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, jnp.int32(NROWS),
            db_tile=8192, bin_top=R,
            precision=jax.lax.Precision.HIGH,
        )
        # cheap tail: min only (isolates the scan)
        return jnp.min(out_s, axis=1), jnp.max(out_i, axis=1)

    return jax.jit(scan)


def main():
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + REPS + 1)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qVs = [jax.random.normal(k, (B, 128), jnp.float32) for k in kq]
    jax.block_until_ready(Vp)

    for R in (1, 2, 3, 4, 6):
        fn = build(R)
        t0 = time.perf_counter()
        _ = np.asarray(fn(db, qVs[-1])[0])
        print(f"R={R}: compile+1st {time.perf_counter()-t0:.1f} s",
              flush=True)
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            _ = np.asarray(fn(db, qVs[i])[0])
            ts.append(time.perf_counter() - t0)
        print(f"R={R}: {1e3*min(ts):7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
