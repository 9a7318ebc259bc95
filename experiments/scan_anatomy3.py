"""Scan floor at B=1024: how low can the per-tile epilogue go?

anatomy2 established: rounds R=2 masked = 26.6 ms/batch on 10⁶ rows
(tournament 2× worse, pallas_v2 2× worse, nomask −10%). This ladder
isolates the floor and prices each epilogue component:

  R1        pack + ONE min-reduce (the selection minimum: any exact
            deferred design pays ≥ this)
  R2        current default (reference point)
  R2-256    BIN=256 (8-bit lane, halves W for the downstream top_k;
            reduce work unchanged — prices the bin width)
  R2-shift  dn pre-shifted by a per-DB constant so the qn add + max(0)
            drop out of the per-element chain (order-preserving;
            timing-equivalent mock)
  R2-DF     DEFAULT-precision matmul (1-pass bf16) — NOT exactness-
            eligible (certificate needs ≥3-pass), priced for reference

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_anatomy3.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("A3_B", 1024))
G = int(os.environ.get("A3_G", 4))
NROWS = int(os.environ.get("A3_ROWS", 122 * 8192))
REPS = int(os.environ.get("A3_REPS", 3))
HIGH = jax.lax.Precision.HIGH
DEF = jax.lax.Precision.DEFAULT


def build(db_tile, bin_top, bin_w, masked, shift, precision=HIGH, unroll=8):
    nt = NROWS // db_tile
    bins = db_tile // bin_w
    lane_mask = bin_w - 1          # 0x7F or 0xFF

    def one_batch(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        qn = jnp.sum(qV * qV, axis=1)
        if shift:
            # dn' = dn + QMAX precomputed at build: scores dn' − 2qd stay
            # positive without the per-element qn add + clamp
            dn = dn + 2.0 * jnp.max(qn)
        xs = (
            Vp.reshape(nt, db_tile, 128),
            C.reshape(nt, db_tile),
            T.reshape(nt, db_tile),
            dn.reshape(nt, db_tile),
            oid.reshape(nt, db_tile),
        )
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bins, bin_w), 2)

        def step(_, tile):
            V_t, C_t, T_t, dn_t, oid_t = tile
            qd = jax.lax.dot_general(
                qV, V_t, (((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
            if shift:
                dist = dn_t[None, :] - 2.0 * qd
            else:
                dist = jnp.maximum(dn_t[None, :] - 2.0 * qd + qn[:, None], 0.0)
            if masked:
                ok = oid_t[None, :] < sn
                ok &= (~ac[:, None]) | (C_t[None, :] == v[:, None])
                ok &= (~at[:, None]) | (
                    (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
                )
                dist = jnp.where(ok, dist, jnp.inf)
            d3 = dist.reshape(B, bins, bin_w)
            packed = (
                jax.lax.bitcast_convert_type(d3, jnp.int32)
                & jnp.int32(~lane_mask)
            ) | lane_iota
            outs = []
            for rnd in range(bin_top):
                m = jnp.min(packed, axis=2)
                outs.append(m)
                if rnd + 1 < bin_top:
                    packed = jnp.where(
                        lane_iota == (m & jnp.int32(lane_mask))[:, :, None],
                        jnp.int32(0x7F800000), packed,
                    )
            return None, jnp.stack(outs, 1)

        _, out = jax.lax.scan(step, None, xs, unroll=min(unroll, nt))
        return jnp.sum(out)

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
            f"{name:34s} {per_b * 1e3:7.2f} ms/batch {GB / per_b:6.1f} GB/s "
            f"{B / per_b:8.0f} QPS  walls={[f'{t*1e3:.0f}' for t in ts]} "
            f"(first {first:.0f}s)",
            flush=True,
        )

    specs = [
        ("R1 mask", build(8192, 1, 128, True, False)),
        ("R1 nomask", build(8192, 1, 128, False, False)),
        ("R2 mask (default)", build(8192, 2, 128, True, False)),
        ("R2 mask BIN=256", build(8192, 2, 256, True, False)),
        ("R2 mask shift", build(8192, 2, 128, True, True)),
        ("R2 nomask shift", build(8192, 2, 128, False, True)),
        ("R2 mask DEFAULT-prec", build(8192, 2, 128, True, False, DEF)),
        ("R1 nomask shift DEFAULT", build(8192, 1, 128, False, True, DEF)),
    ]
    for name, f in specs:
        timeit(name, f)


if __name__ == "__main__":
    main()
