"""End-to-end batch pipeline breakdown in the grouped protocol (B=1024).

Stages (cumulative, each a G-group jitted program, fetch-timed):
  scan            packed selection scan only
  +topk           + final lax.top_k(k'=128) over the (B, W) candidates
  +bin2+topk      + 2nd-level packed bin reduce before the top_k
  +refine         + exact fp32 refinement + finalize (full _search_batch)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/pipeline_profile.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("PP_B", 1024))
G = int(os.environ.get("PP_G", 8))
NROWS = int(os.environ.get("PP_ROWS", 122 * 8192))
DT = 8192
R = 3
BIN = 128
HI = jax.lax.Precision.HIGH

from hvq_tpu.ops.pallas_scan import deferred_packed_scan_xla


def second_level_bin(d, p, rounds=8):
    Bq, W = d.shape
    bins2 = W // BIN
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins2, BIN), 2)
    packed = (
        jax.lax.bitcast_convert_type(d.reshape(Bq, bins2, BIN), jnp.int32)
        & jnp.int32(~0x7F)
    ) | lane
    outs = []
    for rnd in range(rounds):
        m = jnp.min(packed, axis=2)
        outs.append(m)
        if rnd + 1 < rounds:
            packed = jnp.where(
                lane == (m & jnp.int32(0x7F))[:, :, None],
                jnp.int32(0x7F800000), packed,
            )
    keys = jnp.stack(outs, 1).reshape(Bq, rounds * bins2)      # (B, r*bins2)
    bin_idx = jax.lax.broadcasted_iota(
        jnp.int32, (1, rounds, bins2), 2
    ).reshape(1, rounds * bins2)
    col = bin_idx * BIN + (keys & jnp.int32(0x7F))
    d2 = jax.lax.bitcast_convert_type(keys & jnp.int32(~0x7F), jnp.float32)
    pos2 = jnp.take_along_axis(p, jnp.broadcast_to(col, d2.shape), axis=1)
    return d2, pos2


def make(stage):
    def one(db, qV, ac, v, at, l, r, sn):
        Vp, C, T, dn, oid = db
        d, p = deferred_packed_scan_xla(
            Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
            db_tile=DT, bin_top=R, precision=HI,
        )
        if stage == "scan":
            return jnp.min(d, 1), jnp.max(p, 1)
        if stage == "topk":
            neg, idx = jax.lax.top_k(-d, 128)
            return -neg, jnp.take_along_axis(p, idx, 1)
        d2, p2 = second_level_bin(d, p)
        if stage == "bin2":
            neg, idx = jax.lax.top_k(-d2, 128)
            return -neg, jnp.take_along_axis(p2, idx, 1)
        # refine: exact fp32 + finalize-ish sort
        neg, idx = jax.lax.top_k(-d2, 128)
        sel_p = jnp.take_along_axis(p2, idx, 1)
        rows = jnp.take(Vp, sel_p, axis=0)
        diff = rows.astype(jnp.float32) - qV[:, None, :]
        ex = jnp.sum(diff * diff, axis=2)
        ex = jnp.where(jnp.isfinite(-neg), ex, jnp.inf)
        order = jnp.argsort(ex, axis=1)[:, :100]
        return (
            jnp.take_along_axis(ex, order, 1),
            jnp.take_along_axis(sel_p, order, 1),
        )

    def group(db, qVg, ac, v, at, l, r, sn):
        def gstep(_, qV):
            out = one(db, qV, ac, v, at, l, r, sn)
            return None, tuple(jnp.sum(x) for x in out)

        _, sums = jax.lax.scan(gstep, None, qVg)
        return sum(jnp.sum(s) for s in sums)

    return jax.jit(group)


def main():
    print(f"device: {jax.devices()[0]} rows={NROWS} B={B} G={G}", flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 8)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    db = (Vp, C, T, dn, oid)
    qGs = [jax.random.normal(k, (G, B, 128), jnp.float32) for k in kq[:4]]
    ac = jnp.zeros((B,), bool)
    at = jnp.zeros((B,), bool)
    v = jnp.full((B,), -1.0)
    l = jnp.full((B,), -1.0)
    r = jnp.full((B,), -1.0)
    sn = jnp.int32(NROWS)
    np.asarray(jnp.sum(Vp))

    for stage in ("scan", "topk", "bin2", "refine"):
        f = make(stage)
        t0 = time.perf_counter()
        np.asarray(f(db, qGs[0], ac, v, at, l, r, sn))
        first = time.perf_counter() - t0
        ts = []
        for i in (1, 2, 3):
            t0 = time.perf_counter()
            np.asarray(f(db, qGs[i], ac, v, at, l, r, sn))
            ts.append(time.perf_counter() - t0)
        per_b = min(ts) / G
        print(
            f"{stage:8s} {per_b * 1e3:8.2f} ms/batch  {B / per_b:8.0f} QPS "
            f" walls={[f'{t*1e3:.0f}' for t in ts]} (first {first:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
