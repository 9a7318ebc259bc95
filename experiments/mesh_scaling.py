"""Sharded-engine scaling shape on the virtual CPU mesh (1→2→4→8 shards).

Real multi-chip hardware is not available in this environment; what CAN be
validated is the scaling *shape*: the shard_map partitioning, the
allgather top-k merge collective, the pmin-reduced certificate, and the
per-shard work division all running unchanged from 1 to 8 devices with
recall 1.0 and a clean .dist contract. CPU wall-clock is reported for
orientation only (virtual devices share host cores — ICI latency and
per-chip HBM bandwidth are absent), plus the quantity that DOES transfer
to hardware: per-shard row count and the dispatch count, both of which
set the multi-chip throughput model QPS(d) ≈ d · rows/s_per_chip /
(rows + merge_cost·d).

    python experiments/mesh_scaling.py
"""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hvq_tpu.models.oracle import search_oracle  # noqa: E402
from hvq_tpu.models.sharded import ShardedEngine  # noqa: E402
from hvq_tpu.parallel.mesh import make_mesh  # noqa: E402
from hvq_tpu.utils.compare import compare_distances, recall_at_k  # noqa: E402
from hvq_tpu.utils.formats import recompute_result_distances  # noqa: E402
from hvq_tpu.utils.generators import (  # noqa: E402
    generate_dataset,
    generate_queries,
)

N = int(os.environ.get("MS_N", 200_000))
M = int(os.environ.get("MS_M", 512))
B = int(os.environ.get("MS_B", 256))


def main():
    ds = generate_dataset(N, seed=3, categories=100)
    qs = generate_queries(M, seed=4, categories=100)
    oids, odists = search_oracle(ds, qs)
    print(f"rows={N} queries={M} B={B} devices={len(jax.devices())}")
    print(f"{'mesh':>10} {'rows/shard':>11} {'dispatches':>10} "
          f"{'wall_s':>7} {'recall':>7} {'dist':>8}")
    for n_d, n_q in [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)]:
        mesh = make_mesh(
            n_db_shards=n_d, n_query_shards=n_q,
            devices=jax.devices()[: n_d * n_q],
        )
        eng = ShardedEngine(
            ds, mesh=mesh, db_tile=2048, query_batch=B, dispatch_group=4
        )
        dispatches = []
        orig = eng._search_jit
        orig_g = eng._search_group_jit

        def spy(*a, _o=orig, **kw):
            dispatches.append(1)
            return _o(*a, **kw)

        def spy_g(*a, _o=orig_g, **kw):
            dispatches.append(1)
            return _o(*a, **kw)

        eng._search_jit, eng._search_group_jit = spy, spy_g
        eng.search(qs)                       # compile warmup
        t0 = time.perf_counter()
        ids, dists = eng.search(qs)
        wall = time.perf_counter() - t0
        res = compare_distances(
            recompute_result_distances(ds, qs, ids.astype(np.int64)),
            recompute_result_distances(ds, qs, oids.astype(np.int64)),
        )
        rec = recall_at_k(ids, oids, dists, odists)
        n_disp = len(dispatches) // 2        # two searches spied
        print(
            f"d={n_d} q={n_q:>2}   {eng.db.n_pad // n_d:>11} {n_disp:>10} "
            f"{wall:>7.2f} {rec:>7.3f} {res.status:>8}",
            flush=True,
        )
        assert res.ok and rec == 1.0, (n_d, n_q, rec, res)


if __name__ == "__main__":
    main()
