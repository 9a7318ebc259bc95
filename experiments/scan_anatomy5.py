"""axis1 (sublane-reduce) scan tuning: Dt, R, mask, shift combos.

anatomy4 found the structural win: reducing bins along the SECOND-MINOR
axis ((B, BIN, bins), strided position groups — no DB permutation, just a
different reshape + position decode) cuts R2 27.8 → 20.9 ms/batch and
makes extra rounds ~1.2 ms each (vs 6.8 lane-wise). This sweep tunes it:
bins=64 leaves half the lanes idle — Dt=16384 gives bins=128 (full minor
dim); deeper R is now cheap enough to buy the flag rate down.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_anatomy5.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("A5_B", 1024))
G = int(os.environ.get("A5_G", 4))
NROWS = int(os.environ.get("A5_ROWS", 122 * 8192))
REPS = int(os.environ.get("A5_REPS", 3))
HIGH = jax.lax.Precision.HIGH
BIN = 128


def build(db_tile, bin_top, masked=True, shift=False, unroll=8):
    nt = NROWS // db_tile
    bins = db_tile // BIN

    def one_batch(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        qn = jnp.sum(qV * qV, axis=1)
        if shift:
            dn = dn + 2.0 * jnp.max(qn)
        xs = (
            Vp.reshape(nt, db_tile, 128),
            C.reshape(nt, db_tile),
            T.reshape(nt, db_tile),
            dn.reshape(nt, db_tile),
            oid.reshape(nt, db_tile),
        )
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BIN, bins), 1)

        def step(_, tile):
            V_t, C_t, T_t, dn_t, oid_t = tile
            qd = jax.lax.dot_general(
                qV, V_t, (((1,), (1,)), ((), ())),
                precision=HIGH, preferred_element_type=jnp.float32,
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
            d3 = dist.reshape(B, BIN, bins)
            packed = (
                jax.lax.bitcast_convert_type(d3, jnp.int32)
                & jnp.int32(~0x7F)
            ) | sub_iota
            outs = []
            for rnd in range(bin_top):
                m = jnp.min(packed, axis=1)
                outs.append(m)
                if rnd + 1 < bin_top:
                    packed = jnp.where(
                        sub_iota == (m & jnp.int32(0x7F))[:, None, :],
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
        ("axis1 R2 Dt=8k (ref)", build(8192, 2)),
        ("axis1 R2 Dt=16k", build(16384, 2)),
        ("axis1 R3 Dt=16k", build(16384, 3)),
        ("axis1 R4 Dt=16k", build(16384, 4)),
        ("axis1 R2 Dt=16k nomask", build(16384, 2, masked=False)),
        ("axis1 R2 Dt=16k shift", build(16384, 2, shift=True)),
        ("axis1 R2 Dt=16k unroll=16", build(16384, 2, unroll=16)),
        ("axis1 R2 Dt=32k", build(32768, 2, unroll=4)),
    ]
    for name, f in specs:
        if NROWS % (32768 if "32k" in name else 16384 if "16k" in name else 8192):
            print(f"{name}: skipped (rows % Dt)", flush=True)
            continue
        timeit(name, f)


if __name__ == "__main__":
    main()
