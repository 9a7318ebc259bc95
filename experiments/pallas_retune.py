"""Fused Pallas kernel vs XLA packed scan, medium set, current defaults.

The Mosaic output-block constraint (R·bins % 128 == 0) forbade R=3 at
db_tile=8192 (bins=64); at db_tile=16384 (bins=128) any R is legal, so the
kernel can match the XLA path's bin depth. Measures the grouped-regime
selection scan only (the engine's hot 95%), fetch-timed over distinct
query blocks.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/pallas_retune.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("PR_B", 1024))
G = int(os.environ.get("PR_G", 4))
NROWS = 122 * 8192
REPS = int(os.environ.get("PR_REPS", 3))

from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla, fused_packed_scan


def build(impl, db_tile, bin_top, prec):
    nt = NROWS // db_tile

    def one_batch(db, qV):
        Vp, C, T, dn, oid = db
        ac = jnp.zeros((B,), bool)
        at = jnp.zeros((B,), bool)
        v = jnp.full((B,), -1.0)
        l = jnp.full((B,), -1.0)
        r = jnp.full((B,), -1.0)
        sn = jnp.int32(NROWS)
        fn = fused_packed_scan if impl == "pallas" else deferred_packed_scan_xla
        out_s, out_i = fn(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
            db_tile=db_tile, bin_top=bin_top, precision=prec,
        )
        kp = min(128, out_s.shape[1])
        top_neg, idx = jax.lax.top_k(-out_s, kp)
        return -top_neg, jnp.take_along_axis(out_i, idx, axis=1)

    def group(db, qVg):
        def step(_, qV):
            return None, one_batch(db, qV)

        _, out = jax.lax.scan(step, None, qVg)
        return out

    return jax.jit(group)


def main():
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + REPS + 1)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qgs = [
        jax.random.normal(k, (G, B, 128), jnp.float32) for k in kq
    ]
    jax.block_until_ready(Vp)

    HI = jax.lax.Precision.HIGH
    HX = jax.lax.Precision.HIGHEST
    configs = [
        ("xla_packed dt=8192 R=3 HI", "xla", 8192, 3, HI),
        ("pallas     dt=16384 R=3 HX", "pallas", 16384, 3, HX),
        ("pallas     dt=8192 R=4 HX", "pallas", 8192, 4, HX),
    ]
    for name, impl, dt, R, prec in configs:
        try:
            fn = build(impl, dt, R, prec)
            t0 = time.perf_counter()
            out = fn(db, qgs[-1])
            _ = np.asarray(out[0][-1, 0, 0])
            print(f"{name}: compile+1st {time.perf_counter()-t0:.1f} s",
                  flush=True)
            ts = []
            for i in range(REPS):
                t0 = time.perf_counter()
                out = fn(db, qgs[i])
                _ = np.asarray(out[0])
                _ = np.asarray(out[1])
                ts.append(time.perf_counter() - t0)
            per_b = min(ts) / G
            print(f"{name}: {1e3*per_b:7.2f} ms/batch "
                  f"({B/per_b:8.0f} scan-QPS)", flush=True)
        except Exception as e:  # noqa: BLE001 - probe keeps going
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
