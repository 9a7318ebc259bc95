"""Where does the medium-set end-to-end wall go? (real chip)

Replicates BatchedEngine.search's dispatch structure with timers at three
cut points per run:

  enqueue   — host-side: pack + device_put + jit call issue (relay is async)
  compute   — fetch ONE scalar from the LAST program's bundle (device is
              serial, so this waits for all compute but moves ~no bytes)
  transfer  — fetch every bundle (the id+certificate int32 blocks)

Distinct query sets per repetition (the relay caches same-args executions).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/medium_phase_split.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("MPS_N", 1_000_000))
Q = int(os.environ.get("MPS_Q", 10_000))
REPS = int(os.environ.get("MPS_REPS", 3))


def main():
    import jax.numpy as jnp

    from hvq_tpu.models.batched import BatchedEngine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    eng = BatchedEngine(ds)
    B = eng.query_batch
    print("B:", B, "db_tile:", eng.db.db_tile, "impl:", eng.scan_impl,
          "bin_top:", eng.bin_top, "precision:", eng.precision, flush=True)

    qsets = [
        generate_queries(Q, seed=7 + i, categories=1000, centers_seed=0)
        for i in range(REPS + 1)
    ]
    eng.search(qsets[-1], return_dists=False)  # warm all shapes

    from hvq_tpu.models import common
    from hvq_tpu.models.batched import QPACK_W, pack_query_block

    n_t = jnp.int32(ds.n)
    db_args = (eng.db.Vp, eng.db.scan_V, eng.db.C, eng.db.T, eng.db.d_norms)
    for i in range(REPS):
        qs = qsets[i]
        t0 = time.perf_counter()
        Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
        Qpack = pack_query_block(Vq.astype(np.float32), qtype, v, l, r)
        Q_dev = jax.device_put(Qpack)
        t_pack = time.perf_counter()

        from hvq_tpu.models.batched import dispatch_plan

        from hvq_tpu.models.batched import packed_id_width

        kw = packed_id_width(100, eng._id_mode) + 1
        pending = []
        s = 0
        for G in dispatch_plan(m_pad // B, eng.dispatch_group):
            if G > 1:
                e = s + G * B
                b_b, d_b = eng._search_group_jit(
                    *db_args, Q_dev[s:e].reshape(G, B, QPACK_W),
                    n_t, n_t, self_k=100,
                )
            else:
                e = s + B
                b_b, d_b = eng._search_jit(
                    *db_args, Q_dev[s:e], n_t, n_t, self_k=100
                )
            pending.append((s, e, b_b))
            s = e
        t_enq = time.perf_counter()

        last = pending[-1][2]
        _ = np.asarray(last.reshape(-1, kw)[0, 0])
        t_comp = time.perf_counter()

        out = np.empty((m_pad, kw), np.int32)
        for s_, e_, b_b in pending:
            out[s_:e_] = np.asarray(b_b).reshape(e_ - s_, kw)
        t_xfer = time.perf_counter()
        n_susp = int((out[:, -1] != 0).sum())
        print(
            f"rep{i}: pack {1e3*(t_pack-t0):6.1f} ms | "
            f"enqueue {1e3*(t_enq-t_pack):6.1f} ms | "
            f"compute {1e3*(t_comp-t_enq):7.1f} ms | "
            f"transfer {1e3*(t_xfer-t_comp):7.1f} ms | "
            f"total {t_xfer-t0:6.3f} s | suspects {n_susp}",
            flush=True,
        )


if __name__ == "__main__":
    main()
