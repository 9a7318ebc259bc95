"""Anatomy of one packed-scan step: which component costs the 34 ms/batch?

Measures matmul-only, +mask, +pack/min-rounds, precision and tile-size
variants — all jitted, db as arguments, distinct query blocks per call.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/scan_anatomy.py
"""
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("AN_B", 256))
NROWS = int(os.environ.get("AN_ROWS", 122 * 8192))
ITERS = int(os.environ.get("AN_ITERS", 5))
# one warmup block + ITERS timed blocks, ALL distinct: the relay caches
# same-args executions (~0.03 ms), so any repeat poisons the timing
N_QV = 1 + ITERS
BIN = 128

HI = jax.lax.Precision.HIGHEST
DEF = jax.lax.Precision.DEFAULT


def build(db_tile, precision, mask, pack_rounds, unroll=8, sum_only=False):
    nt = NROWS // db_tile
    bins = db_tile // BIN

    def run(db, qV, ac, v, at, l, r, sn):
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
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            dist = jnp.maximum(dn_t[None, :] - 2.0 * qd + qn[:, None], 0.0)
            if mask:
                ok = oid_t[None, :] < sn
                ok &= (~ac[:, None]) | (C_t[None, :] == v[:, None])
                ok &= (~at[:, None]) | (
                    (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
                )
                dist = jnp.where(ok, dist, jnp.inf)
            if sum_only:
                return None, jnp.sum(dist, axis=1)
            d3 = dist.reshape(B, bins, BIN)
            packed = (
                jax.lax.bitcast_convert_type(d3, jnp.int32)
                & jnp.int32(~0x7F)
            ) | lane_iota
            outs = []
            for rnd in range(pack_rounds):
                m = jnp.min(packed, axis=2)
                outs.append(m)
                if rnd + 1 < pack_rounds:
                    packed = jnp.where(
                        lane_iota == (m & jnp.int32(0x7F))[:, :, None],
                        jnp.int32(0x7F800000), packed,
                    )
            return None, jnp.stack(outs, 1)

        _, out = jax.lax.scan(step, None, xs, unroll=min(unroll, nt))
        return out

    return jax.jit(run)


def main():
    print("device:", jax.devices()[0], "rows:", NROWS, "B:", B, flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + N_QV)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qVs = [jax.random.normal(k, (B, 128), jnp.float32) for k in kq]
    kb = jax.random.split(jax.random.PRNGKey(9), 6)
    ac = jax.random.uniform(kb[0], (B,)) < 0.5
    at = jax.random.uniform(kb[1], (B,)) < 0.5
    v = jnp.floor(jax.random.uniform(kb[2], (B,), maxval=1000.0))
    l = jax.random.uniform(kb[3], (B,), minval=-3.0, maxval=0.0)
    r = jax.random.uniform(kb[4], (B,), minval=0.0, maxval=3.0)
    sn = jnp.int32(NROWS)
    jax.block_until_ready(Vp)

    def timeit(name, fn):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(db, qVs[0], ac, v, at, l, r, sn))
        first = time.perf_counter() - t0
        times = []
        for i in range(1, N_QV):               # every call fresh args
            t0 = time.perf_counter()
            jax.block_until_ready(fn(db, qVs[i], ac, v, at, l, r, sn))
            times.append(time.perf_counter() - t0)
        best = min(times)
        med = sorted(times)[len(times) // 2]
        gbps = NROWS * 512 / med / 1e9
        print(f"{name:42s} med {med * 1e3:8.2f} ms  min {best * 1e3:8.2f}"
              f"  {gbps:6.1f} GB/s  (first {first:.0f}s)", flush=True)

    specs = [
        ("matmul HIGHEST sum", dict(db_tile=8192, precision=HI, mask=False, pack_rounds=0, sum_only=True)),
        ("matmul DEFAULT sum", dict(db_tile=8192, precision=DEF, mask=False, pack_rounds=0, sum_only=True)),
        ("matmul+mask sum", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=0, sum_only=True)),
        ("matmul+pack R=1 (no mask)", dict(db_tile=8192, precision=HI, mask=False, pack_rounds=1)),
        ("matmul+mask+pack R=1", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=1)),
        ("matmul+mask+pack R=2", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=2)),
        ("matmul+mask+pack R=3", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=3)),
        ("matmul+mask+pack R=3 DEFAULT", dict(db_tile=8192, precision=DEF, mask=True, pack_rounds=3)),
        ("matmul+mask+pack R=3 Dt=16384", dict(db_tile=16384, precision=HI, mask=True, pack_rounds=3)),
        ("matmul+mask+pack R=3 unroll=1", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=3, unroll=1)),
        ("matmul+mask+pack R=3 unroll=16", dict(db_tile=8192, precision=HI, mask=True, pack_rounds=3, unroll=16)),
    ]
    for name, kw in specs:
        if NROWS % kw["db_tile"]:
            print(f"{name}: skipped (rows not divisible)", flush=True)
            continue
        timeit(name, build(**kw))


if __name__ == "__main__":
    main()
