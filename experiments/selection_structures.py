"""Which selection structure wins at HIGH precision? Marginal-cost protocol.

Variants per database tile inside the lax.scan:
  * packed   — bitcast+lane keys, R min-rounds (current default)
  * approx   — jax.lax.approx_min_k PartialReduce, aggregate_to_topk=False
  * approxT  — approx_min_k with aggregate_to_topk=True (k per tile)
with and without the predicate mask, two tile sizes.

Timing: enqueue K calls with distinct query blocks, single fetch; marginal
between K=4 and K=20 removes the relay's fixed round-trip cost
(block_until_ready does NOT block through the axon relay — measured).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/selection_structures.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("SEL_B", 256))
NROWS = int(os.environ.get("SEL_ROWS", 122 * 8192))
BIN = 128
HI = jax.lax.Precision.HIGH


def build(db_tile, kind, mask, bin_top=3, unroll=8):
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
                precision=HI, preferred_element_type=jnp.float32,
            )
            dist = jnp.maximum(dn_t[None, :] - 2.0 * qd + qn[:, None], 0.0)
            if mask:
                ok = oid_t[None, :] < sn
                ok &= (~ac[:, None]) | (C_t[None, :] == v[:, None])
                ok &= (~at[:, None]) | (
                    (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
                )
                dist = jnp.where(ok, dist, jnp.inf)
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
                    -dist, 128, recall_target=0.99,
                    aggregate_to_topk=False,
                )
                return None, (neg, idx.astype(jnp.int32))
            if kind == "approxT":
                neg, idx = jax.lax.approx_max_k(
                    -dist, 128, recall_target=0.99,
                    aggregate_to_topk=True,
                )
                return None, (neg, idx.astype(jnp.int32))
            raise ValueError(kind)

        _, out = jax.lax.scan(step, None, xs, unroll=min(unroll, nt))
        # reduce to scalars ON DEVICE: keeps 30+ enqueued calls from
        # holding wide outputs live in HBM (RESOURCE_EXHAUSTED otherwise)
        return sum(jnp.sum(x) for x in jax.tree.leaves(out))

    return jax.jit(run)


def main():
    print("device:", jax.devices()[0], "rows:", NROWS, "B:", B, flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 60)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qVs = [jax.random.normal(k, (B, 128), jnp.float32) for k in kq[:52]]
    ac = jnp.zeros((B,), bool)
    at = jnp.zeros((B,), bool)
    v = jnp.full((B,), -1.0)
    l = jnp.full((B,), -1.0)
    r = jnp.full((B,), -1.0)
    sn = jnp.int32(NROWS)
    np.asarray(jnp.sum(Vp))
    GB = NROWS * 512 / 1e9

    qi = [0]

    def marginal(name, f, k_lo=2, k_hi=34):
        t0 = time.perf_counter()
        out = f(db, qVs[qi[0]], ac, v, at, l, r, sn)
        np.asarray(out)
        first = time.perf_counter() - t0
        qi[0] += 1
        margs = []
        for _ in range(2):                     # two independent estimates
            walls = {}
            for K in (k_lo, k_hi):
                if qi[0] + K > len(qVs):
                    qi[0] = 1
                t0 = time.perf_counter()
                outs = [
                    f(db, qVs[qi[0] + i], ac, v, at, l, r, sn)
                    for i in range(K)
                ]
                np.asarray(jnp.stack(outs))
                walls[K] = time.perf_counter() - t0
                qi[0] += K
            margs.append((walls[k_hi] - walls[k_lo]) / (k_hi - k_lo))
        marg = min(m for m in margs if m > 0) if any(
            m > 0 for m in margs) else max(margs)
        print(
            f"{name:34s} {marg * 1e3:7.2f} ms/b {GB / marg:6.1f} GB/s "
            f"{B / marg:8.0f} QPS  (ests {[f'{m*1e3:.1f}' for m in margs]},"
            f" first {first:.0f}s)",
            flush=True,
        )

    specs = [
        ("packed R=3 mask Dt=8k", build(8192, "packed", True)),
        ("packed R=3 nomask Dt=8k", build(8192, "packed", False)),
        ("approx mask Dt=8k", build(8192, "approx", True)),
        ("approx nomask Dt=8k", build(8192, "approx", False)),
        ("approxT mask Dt=8k", build(8192, "approxT", True)),
        ("packed R=3 mask Dt=16k", build(16384, "packed", True)),
        ("approx mask Dt=16k", build(16384, "approx", True)),
        ("matmul-only (sum)", None),
    ]
    for name, fn in specs:
        if fn is None:
            f = jax.jit(
                lambda db, q, ac, v, at, l, r, sn: jnp.sum(
                    jax.lax.dot_general(
                        q, db[0], (((1,), (1,)), ((), ())),
                        precision=HI, preferred_element_type=jnp.float32,
                    )
                )
            )
            marginal(name, f)
        else:
            marginal(name, fn)


if __name__ == "__main__":
    main()
