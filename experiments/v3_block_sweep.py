"""v3 kernel grid-block sweep (follow-up to v3_anatomy.py).

v3_anatomy measured the full R2 kernel at 16.1 ms/batch where flops price
~4 ms and HBM ~0.3 ms — and the matmul-only skeleton at 12.2 ms = 36 µs per
(256, 16384) grid step vs a ~6 µs MXU price. Hypothesis: per-grid-step
overhead dominates; bigger (b_block, db_tile) blocks amortize it. VMEM
bounds the sweep: dist f32 + packed keys = 8·BB·DT bytes must fit beside
the double-buffered V tile under ~110 MB.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/v3_block_sweep.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

from hvq_tpu.ops.pallas_scan import fused_packed_scan_v3  # noqa: E402

B = int(os.environ.get("V3S_B", 1024))
G = int(os.environ.get("V3S_G", 4))
NROWS = int(os.environ.get("V3S_ROWS", 64 * 16384))
REPS = int(os.environ.get("V3S_REPS", 3))


def build(db_tile, b_block, bin_top):
    def group(Vp, C, T, dn, oid, qVg, ac, v, at, l, r, sn):
        def gstep(_, qV):
            s, p = fused_packed_scan_v3(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=db_tile, bin_top=bin_top, b_block=b_block,
            )
            return None, jnp.sum(p)

        _, sums = jax.lax.scan(gstep, None, qVg)
        return jnp.sum(sums)

    return jax.jit(group)


def main():
    print(f"device: {jax.devices()[0]} rows={NROWS} B={B} G={G}", flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + REPS + 1)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    Vb = Vp.astype(jnp.bfloat16)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
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

    def timeit(name, f, V):
        try:
            t0 = time.perf_counter()
            np.asarray(f(V, C, T, dn, oid, qGs[0], ac, v, at, l, r, sn))
            first = time.perf_counter() - t0
            ts = []
            for i in range(1, REPS + 1):
                t0 = time.perf_counter()
                np.asarray(f(V, C, T, dn, oid, qGs[i], ac, v, at, l, r, sn))
                ts.append(time.perf_counter() - t0)
            per_b = min(ts) / G
            print(f"{name:30s} {per_b*1e3:7.2f} ms/batch {GB/per_b:6.1f} GB/s"
                  f" {B/per_b:8.0f} QPS (first {first:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    for dt, bb in ((16384, 256), (16384, 512), (32768, 256)):
        if NROWS % dt:
            continue
        timeit(f"fp32 Dt={dt} BB={bb} R2", build(dt, bb, 2), Vp)
    for dt, bb in ((16384, 256), (16384, 512), (32768, 256), (32768, 512)):
        if NROWS % dt:
            continue
        timeit(f"bf16 Dt={dt} BB={bb} R2", build(dt, bb, 2), Vb)


if __name__ == "__main__":
    main()
