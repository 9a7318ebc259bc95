"""Round-2 scan-step ladder at B=1024: tournament vs rounds, mask cost.

The large set runs ~304 ms/batch of which ~all is the per-tile scan step
(per-tile ≈ 21 µs + 0.22 µs·B, VPU-structural). The two full lane-reduces
of the rounds top-2 and the ~9-op predicate mask are the biggest op
counts; this sweep measures the replacements on the chip:

* tournament — packed_top2_tournament: (best, second) pairs up a binary
  min/max tree, ~one full-width pass total, pure-tree dataflow that can
  fuse into the score tile's consumer.
* masked=False — statically dropped predicate/sample mask (the all-type-0
  + sample=1 specialization the engine can route to).
* db_tile / unroll interactions under the new structure.

Grouped G-batch programs, fetch-timed with distinct query groups
(experiments/group_throughput.py protocol — block_until_ready lies
through the relay; same-args re-execution hits a relay cache).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_anatomy2.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("A2_B", 1024))
G = int(os.environ.get("A2_G", 4))
NROWS = int(os.environ.get("A2_ROWS", 122 * 8192))
REPS = int(os.environ.get("A2_REPS", 3))

from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla  # noqa: E402


def build(db_tile, reduce_impl, masked, unroll=8, bin_top=2):
    def one_batch(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        d_out, p_out = deferred_packed_scan_xla(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
            db_tile=db_tile, bin_top=bin_top,
            precision=jax.lax.Precision.HIGH,
            unroll=unroll, reduce_impl=reduce_impl, masked=masked,
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
        ("rounds mask Dt=8k (r1 default)", build(8192, "rounds", True)),
        ("tourn  mask Dt=8k", build(8192, "tournament", True)),
        ("tourn  nomask Dt=8k", build(8192, "tournament", False)),
        ("rounds nomask Dt=8k", build(8192, "rounds", False)),
        ("tourn  mask Dt=16k", build(16384, "tournament", True)),
        ("tourn  mask Dt=32k", build(32768, "tournament", True)),
        ("tourn  mask Dt=8k unroll=16", build(8192, "tournament", True, unroll=16)),
    ]
    for name, f in specs:
        if NROWS % (16384 if "16k" in name else 32768 if "32k" in name else 8192):
            print(f"{name}: skipped", flush=True)
            continue
        timeit(name, f)


if __name__ == "__main__":
    main()
