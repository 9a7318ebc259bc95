"""Steady-state per-batch cost via grouped programs (the engine's shape).

One jitted program = lax.scan over G query batches of the full selection
scan (exactly BatchedEngine._search_group's structure). Fetch-timed over
distinct query groups; per-batch = wall / G with the relay's fixed
round-trip diluted by G. This is the throughput quantity the engine sees.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/group_throughput.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("GT_B", 256))
G = int(os.environ.get("GT_G", 16))
NROWS = int(os.environ.get("GT_ROWS", 122 * 8192))
REPS = int(os.environ.get("GT_REPS", 3))
BIN = 128

PREC = {
    "HI": jax.lax.Precision.HIGH,
    "HX": jax.lax.Precision.HIGHEST,
    "DF": jax.lax.Precision.DEFAULT,
}

from hvq_tpu.ops.pallas_scan import fused_packed_scan, kernel_bin_top


def build(db_tile, kind, mask, prec, bin_top=3, unroll=8):
    nt = NROWS // db_tile
    bins = db_tile // BIN
    precision = PREC[prec]

    def one_batch(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        qn = jnp.sum(qV * qV, axis=1)
        xs = (
            Vp.reshape(nt, db_tile, 128),
            C.reshape(nt, db_tile),
            T.reshape(nt, db_tile),
            dn.reshape(nt, db_tile),
            oid.reshape(nt, db_tile),
        )
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bins, BIN), 2)

        def step(_, tile):
            V_t, C_t, T_t, dn_t, oid_t = tile
            qd = jax.lax.dot_general(
                qV, V_t, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
            dist = jnp.maximum(dn_t[None, :] - 2.0 * qd + qn[:, None], 0.0)
            if mask:
                ok = oid_t[None, :] < sn
                ok &= (~ac[:, None]) | (C_t[None, :] == v[:, None])
                ok &= (~at[:, None]) | (
                    (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
                )
                dist = jnp.where(ok, dist, jnp.inf)
            if kind == "matmul":
                return None, jnp.sum(dist, axis=1)
            if kind == "packed":
                d3 = dist.reshape(B, bins, BIN)
                packed = (
                    jax.lax.bitcast_convert_type(d3, jnp.int32)
                    & jnp.int32(~0x7F)
                ) | lane_iota
                outs = []
                for rnd in range(bin_top):
                    m = jnp.min(packed, axis=2)
                    outs.append(m)
                    if rnd + 1 < bin_top:
                        packed = jnp.where(
                            lane_iota == (m & jnp.int32(0x7F))[:, :, None],
                            jnp.int32(0x7F800000), packed,
                        )
                return None, jnp.stack(outs, 1)
            if kind == "approx":
                neg, idx = jax.lax.approx_max_k(
                    -dist, 128, recall_target=0.99, aggregate_to_topk=False,
                )
                return None, (neg, idx.astype(jnp.int32))
            raise ValueError(kind)

        if kind == "pallas":
            Rk = kernel_bin_top(db_tile, NROWS)
            d_out, p_out = fused_packed_scan(
                Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                db_tile=db_tile, bin_top=Rk, precision=precision,
            )
            return jnp.sum(jnp.where(jnp.isfinite(d_out), d_out, 0.0)) + jnp.sum(p_out).astype(jnp.float32)

        _, out = jax.lax.scan(step, None, xs, unroll=min(unroll, nt))
        return sum(jnp.sum(x) for x in jax.tree.leaves(out))

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
    qGs = [
        jax.random.normal(k, (G, B, 128), jnp.float32) for k in kq
    ]
    ac = jnp.zeros((B,), bool)
    at = jnp.zeros((B,), bool)
    v = jnp.full((B,), -1.0)
    l = jnp.full((B,), -1.0)
    r = jnp.full((B,), -1.0)
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
            f"{name:32s} {per_b * 1e3:7.2f} ms/batch {GB / per_b:6.1f} GB/s "
            f"{B / per_b:8.0f} QPS  walls={[f'{t*1e3:.0f}' for t in ts]} "
            f"(first {first:.0f}s)",
            flush=True,
        )

    if os.environ.get("GT_PALLAS"):
        dts = [int(x) for x in os.environ["GT_PALLAS"].split(",")]
        specs = [
            (f"pallas HI B={B} Dt={dt}", build(dt, "pallas", True, "HI"))
            for dt in dts if NROWS % dt == 0
        ] + [(f"packed HI B={B} Dt=8192", build(8192, "packed", True, "HI"))]
    elif os.environ.get("GT_SWEEP"):
        specs = [
            (f"packed HI B={B} Dt={dt}", build(dt, "packed", True, "HI"))
            for dt in (8192, 16384, 32768)
            if NROWS % dt == 0
        ]
    else:
        specs = [
            ("matmul-only HI", build(8192, "matmul", False, "HI")),
            ("packed mask HI", build(8192, "packed", True, "HI")),
            ("packed mask HX", build(8192, "packed", True, "HX")),
            ("packed mask DF", build(8192, "packed", True, "DF")),
            ("packed nomask HI", build(8192, "packed", False, "HI")),
            ("approx mask HI", build(8192, "approx", True, "HI")),
            ("packed mask HI Dt=16k", build(16384, "packed", True, "HI")),
            ("packed mask HI u16", build(8192, "packed", True, "HI", unroll=16)),
        ]
    for name, f in specs:
        timeit(name, f)


if __name__ == "__main__":
    main()
