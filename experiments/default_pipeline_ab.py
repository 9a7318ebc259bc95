"""Default-set pipelining A/B: collapse the ~100 ms above the wire floor.

default_phase_split.py measured (same session): engine 284 ms end-to-end
vs a 183 ms wire floor (upload 4.26 MB ≈ 75 ms + fetch 2.09 MB ≈ 80 ms +
27 ms dispatch latency). The slack is structural: at D ≤ 2¹⁷ the engine
ships ONE group program (dispatch_group=0), so the query upload, ALL
device compute, and the result fetch serialize. Variants replayed here
against the same engine programs:

  one_group   — the shipping driver (baseline)
  groups(G)   — one upload, G dispatches: fetch of group i overlaps
                compute of group i+1 (prefetch_host pipelining)
  pipelined(G)— G per-group UPLOADS too: upload of group i+1 overlaps
                compute of group i (puts are async; the relay pipelines)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/default_pipeline_ab.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("DPA_N", 10_000))
Q = int(os.environ.get("DPA_Q", 10_000))
REPS = int(os.environ.get("DPA_REPS", 3))


def main():
    import jax.numpy as jnp

    from hvq_tpu.models import common
    from hvq_tpu.models.batched import (
        QPACK_W,
        BatchedEngine,
        pack_query_block,
        packed_id_width,
    )
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    eng = BatchedEngine(ds)
    B = eng.query_batch
    kw = packed_id_width(100, eng._id_mode) + 1
    n_t = jnp.int32(ds.n)
    db_args = (eng.db.Vp, eng.db.scan_V, eng.db.C, eng.db.T, eng.db.d_norms)

    qsets = [
        generate_queries(Q, seed=31 + i, categories=1000, centers_seed=0)
        for i in range(REPS)
    ]
    packs = []
    for qs in qsets:
        Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
        packs.append(pack_query_block(Vq.astype(np.float32), qtype, v, l, r))
    nb = m_pad // B

    def run_variant(tag, G, split_upload):
        # warm shapes
        warm = packs[0]
        if G >= nb:
            eng._search_group_jit(
                *db_args, jax.device_put(warm).reshape(nb, B, QPACK_W),
                n_t, n_t, self_k=100,
            )[0].block_until_ready()
        else:
            eng._search_group_jit(
                *db_args,
                jax.device_put(warm[: G * B]).reshape(G, B, QPACK_W),
                n_t, n_t, self_k=100,
            )[0].block_until_ready()
        walls = []
        for rep in range(REPS):
            Qpack = packs[rep]
            t0 = time.perf_counter()
            pending = []
            if not split_upload:
                Q_dev = jax.device_put(Qpack)
            for s in range(0, nb, G):
                g = min(G, nb - s)
                if split_upload:
                    blk = jax.device_put(
                        Qpack[s * B : (s + g) * B].reshape(g, B, QPACK_W)
                    )
                else:
                    blk = Q_dev[s * B : (s + g) * B].reshape(g, B, QPACK_W)
                b_b, _ = eng._search_group_jit(
                    *db_args, blk, n_t, n_t, self_k=100
                )
                pending.append((s * B, (s + g) * B, b_b))
            common.prefetch_host(b for _, _, b in pending)
            out = np.empty((m_pad, kw), np.int32)
            for s_, e_, b_b in pending:
                out[s_:e_] = np.asarray(b_b).reshape(e_ - s_, kw)
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        print(
            f"{tag:16s}: {1e3*w:6.1f} ms = {Q/w:8.0f} QPS "
            f"({[f'{1e3*x:.0f}' for x in walls]})",
            flush=True,
        )

    run_variant("one_group", nb, False)
    for G in (5, 2, 1):
        run_variant(f"groups({G})", G, False)
    for G in (5, 2, 1):
        run_variant(f"pipelined({G})", G, True)


if __name__ == "__main__":
    main()
