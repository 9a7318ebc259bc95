"""Structural scan variants: sublane-axis bin reduce + giant tiles.

anatomy3 priced the epilogue components (round2 6.8 ms, mask 2.2,
HIGH−DEFAULT 4.7, qn-fold 0.7 of 27.2 total) — op-trimming caps at ~10%.
The remaining levers are structural:

* axis-1 reduce — pre-permute each tile's rows so bin members sit along
  the SUBLANE axis ((B, BIN, bins), reduce over axis 1): XLA lowers
  second-minor reduces without cross-lane shuffles. Row permutation is
  free at build time (bins are arbitrary row groups); keys carry the
  sublane slice index instead of the lane.
* giant tiles — db_tile = n/2 or n (monolithic dot): removes the 122-step
  lax.scan machinery entirely and lets XLA pick its own tiling for the
  matmul + epilogue; intermediates may materialize in HBM (~2 GB/pass at
  B=1024 × 500k — ~3 ms at measured stream rate, cheaper than the
  structural overhead it replaces if fusion holds).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_anatomy4.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("A4_B", 1024))
G = int(os.environ.get("A4_G", 4))
NROWS = int(os.environ.get("A4_ROWS", 122 * 8192))
REPS = int(os.environ.get("A4_REPS", 3))
HIGH = jax.lax.Precision.HIGH
BIN = 128


def build(db_tile, bin_top, masked=True, axis1=False, unroll=8):
    nt = NROWS // db_tile
    bins = db_tile // BIN

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
        if axis1:
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BIN, bins), 1)
        else:
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bins, BIN), 2)

        def step(_, tile):
            V_t, C_t, T_t, dn_t, oid_t = tile
            qd = jax.lax.dot_general(
                qV, V_t, (((1,), (1,)), ((), ())),
                precision=HIGH, preferred_element_type=jnp.float32,
            )
            dist = jnp.maximum(dn_t[None, :] - 2.0 * qd + qn[:, None], 0.0)
            if masked:
                ok = oid_t[None, :] < sn
                ok &= (~ac[:, None]) | (C_t[None, :] == v[:, None])
                ok &= (~at[:, None]) | (
                    (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
                )
                dist = jnp.where(ok, dist, jnp.inf)
            if axis1:
                # row p of the tile belongs to bin p % bins, slice p // bins:
                # reduce runs over the second-minor axis (sublanes)
                d3 = dist.reshape(B, BIN, bins)
                red_axis = 1
            else:
                d3 = dist.reshape(B, bins, BIN)
                red_axis = 2
            packed = (
                jax.lax.bitcast_convert_type(d3, jnp.int32)
                & jnp.int32(~0x7F)
            ) | sub_iota
            outs = []
            for rnd in range(bin_top):
                m = jnp.min(packed, axis=red_axis)
                outs.append(m)
                if rnd + 1 < bin_top:
                    sel = (m & jnp.int32(0x7F))[:, None, :] if axis1 else (
                        m & jnp.int32(0x7F)
                    )[:, :, None]
                    packed = jnp.where(
                        sub_iota == sel, jnp.int32(0x7F800000), packed
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
        ("R2 mask lane-reduce (ref)", build(8192, 2)),
        ("R2 mask axis1-reduce", build(8192, 2, axis1=True)),
        ("R1 mask axis1-reduce", build(8192, 1, axis1=True)),
        ("R2 mask Dt=64k", build(65536, 2, unroll=4)),
        ("R2 mask Dt=499712", build(499712, 2, unroll=1)),
        ("R2 mask Dt=999424 (monolithic)", build(999424, 2, unroll=1)),
        ("R2 mask axis1 Dt=499712", build(499712, 2, axis1=True, unroll=1)),
    ]
    for name, f in specs:
        try:
            timeit(name, f)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
