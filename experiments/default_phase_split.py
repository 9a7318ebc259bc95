"""Default-set (D=10^4, Q=10^4) wall anatomy + wire floor (real chip).

VERDICT r4 #2: the default set is the weakest headline row (2.91x) and at
D=10^4 the device compute is trivially small — the question is how much of
the ~227 ms wall is RELAY WIRE (query upload + result fetch + dispatch
latency, irreducible here) vs collapsible overhead.

Protocol (same cut points as medium_phase_split.py, at N=10^4):

  pack      — host: pad + pack queries into ONE (m_pad, 104) f32 block
  upload    — jax.device_put of that block (4.16 MB)
  enqueue   — jit call issue (dispatch_plan is ONE group at this scale)
  compute   — fetch one scalar of the bundle (waits for device compute)
  transfer  — fetch the (m_pad, 51) int32 bundle (2.09 MB, 16-bit-packed ids)
  unbundle  — host: 16-bit unpack + uint32 cast

plus a WIRE MICROBENCH in the same process: raw device_put of the same
query bytes, raw fetch of the same bundle bytes, and an empty round trip
(fixed relay latency) — the floor the engine driver can be compared
against.

    PYTHONPATH=/root/repo python experiments/default_phase_split.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("DPS_N", 10_000))
Q = int(os.environ.get("DPS_Q", 10_000))
REPS = int(os.environ.get("DPS_REPS", 3))


def wire_floor(m_pad, kw):
    """Raw relay costs for the exact byte shapes the engine moves."""
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1)
    up = jax.jit(lambda x: x[0, 0])          # consume an upload, return 1 elt
    dn = jax.jit(
        lambda s: (jnp.arange(m_pad * kw, dtype=jnp.int32) + s).reshape(
            m_pad, kw
        )
    )
    # warm
    np.asarray(tiny(jnp.int32(0)))
    np.asarray(up(jax.device_put(np.zeros((m_pad, 104), np.float32))))
    np.asarray(dn(jnp.int32(0)))
    rows = []
    for i in range(REPS):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.int32(i)))
        t1 = time.perf_counter()
        qblk = np.full((m_pad, 104), float(i), np.float32)
        d = jax.device_put(qblk)
        r = up(d)
        np.asarray(r)
        t2 = time.perf_counter()
        b = dn(jnp.int32(i))
        np.asarray(b)
        t3 = time.perf_counter()
        rows.append((t1 - t0, t2 - t1, t3 - t2))
    rt, upt, dnt = (np.median([r[j] for r in rows]) for j in range(3))
    print(
        f"wire floor: empty round-trip {1e3*rt:6.1f} ms | "
        f"upload {m_pad*104*4/1e6:.2f} MB {1e3*upt:6.1f} ms | "
        f"fetch {m_pad*kw*4/1e6:.2f} MB {1e3*dnt:6.1f} ms | "
        f"sum {1e3*(rt+upt+dnt):6.1f} ms",
        flush=True,
    )
    return rt + upt + dnt


def main():
    import jax.numpy as jnp

    from hvq_tpu.models import common
    from hvq_tpu.models.batched import (
        QPACK_W,
        BatchedEngine,
        dispatch_plan,
        pack_query_block,
        packed_id_width,
    )
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    eng = BatchedEngine(ds)
    B = eng.query_batch
    plan = dispatch_plan(-(-Q // B), eng.dispatch_group)
    print(
        f"B={B} db_tile={eng.db.db_tile} impl={eng.scan_impl} "
        f"dispatch_group={eng.dispatch_group} plan={plan} "
        f"id_mode={eng._id_mode}",
        flush=True,
    )

    qsets = [
        generate_queries(Q, seed=7 + i, categories=1000, centers_seed=0)
        for i in range(REPS + 1)
    ]
    eng.search(qsets[-1], return_dists=False)      # warm all shapes

    kw = packed_id_width(100, eng._id_mode) + 1
    n_t = jnp.int32(ds.n)
    db_args = (eng.db.Vp, eng.db.scan_V, eng.db.C, eng.db.T, eng.db.d_norms)

    # end-to-end engine wall first (the number bench.py reports)
    walls = []
    for i in range(REPS):
        t0 = time.perf_counter()
        eng.search(qsets[i], return_dists=False)
        walls.append(time.perf_counter() - t0)
    w = float(np.median(walls))
    print(
        f"engine end-to-end: {1e3*w:6.1f} ms = {Q/w:8.0f} QPS "
        f"(all reps: {[f'{1e3*x:.0f}' for x in walls]})",
        flush=True,
    )

    for i in range(REPS):
        qs = qsets[i]
        t0 = time.perf_counter()
        Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
        Qpack = pack_query_block(Vq.astype(np.float32), qtype, v, l, r)
        t_pack = time.perf_counter()
        Q_dev = jax.device_put(Qpack)
        t_up = time.perf_counter()
        pending = []
        s = 0
        for G in dispatch_plan(m_pad // B, eng.dispatch_group):
            e = s + G * B
            if G > 1:
                b_b, d_b = eng._search_group_jit(
                    *db_args, Q_dev[s:e].reshape(G, B, QPACK_W),
                    n_t, n_t, self_k=100,
                )
            else:
                b_b, d_b = eng._search_jit(
                    *db_args, Q_dev[s:e], n_t, n_t, self_k=100
                )
            pending.append((s, e, b_b))
            s = e
        t_enq = time.perf_counter()
        _ = np.asarray(pending[-1][2].reshape(-1, kw)[0, 0])
        t_comp = time.perf_counter()
        common.prefetch_host(b for _, _, b in pending)
        out = np.empty((m_pad, kw), np.int32)
        for s_, e_, b_b in pending:
            out[s_:e_] = np.asarray(b_b).reshape(e_ - s_, kw)
        t_xfer = time.perf_counter()
        from hvq_tpu.models.batched import unbundle_ids

        ids, suspect = unbundle_ids(out, 100, eng._id_mode)
        ids = ids[:Q].astype(np.uint32)
        t_unb = time.perf_counter()
        print(
            f"rep{i}: pack {1e3*(t_pack-t0):5.1f} | "
            f"upload {1e3*(t_up-t_pack):5.1f} | "
            f"enqueue {1e3*(t_enq-t_up):5.1f} | "
            f"compute {1e3*(t_comp-t_enq):6.1f} | "
            f"transfer {1e3*(t_xfer-t_comp):6.1f} | "
            f"unbundle {1e3*(t_unb-t_xfer):4.1f} ms | "
            f"total {1e3*(t_unb-t0):6.1f} ms | suspects {int(suspect.sum())}",
            flush=True,
        )

    floor = wire_floor(-(-Q // B) * B, kw)
    print(
        f"floor-implied max QPS at this protocol: {Q/floor:8.0f} "
        f"(vs reference 15152)",
        flush=True,
    )


if __name__ == "__main__":
    main()
