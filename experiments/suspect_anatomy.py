"""Which queries flag the exactness certificate on the medium set?

Joins the per-query suspect bit with query type / predicate selectivity to
find the population that violates the Poisson bin-occupancy model.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/suspect_anatomy.py
"""
import os
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

N = int(os.environ.get("SA_N", 1_000_000))
Q = int(os.environ.get("SA_Q", 10_000))


def main():
    from hvq_tpu.models.batched import BatchedEngine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(Q, seed=7, categories=1000, centers_seed=0)
    eng = BatchedEngine(ds)

    # capture the suspect vector instead of escalating
    captured = {}
    orig = eng._rerun_suspects

    def spy(Q_dev, suspects, *a, **kw):
        captured["suspects"] = suspects.copy()
        return orig(Q_dev, suspects, *a, **kw)

    eng._rerun_suspects = spy
    t0 = time.perf_counter()
    ids, _ = eng.search(qs, return_dists=False)
    print(f"search wall {time.perf_counter()-t0:.2f} s", flush=True)

    sus = captured.get("suspects")
    if sus is None:
        print("no suspects at all")
        return
    sus = sus[: qs.m]
    print(f"suspects: {int(sus.sum())} / {qs.m}")
    # per-type counts
    for t in range(4):
        m = qs.qtype == t
        print(f"  type {t}: {int(sus[m].sum()):4d} of {int(m.sum())}")
    # selectivity of flagged queries
    idx = np.nonzero(sus)[0]
    for i in idx[:40]:
        t = int(qs.qtype[i])
        n_match = N
        if t in (1, 3):
            n_match_c = int((ds.C == qs.v[i]).sum())
        if t in (2, 3):
            tm = (ds.T >= qs.l[i]) & (ds.T <= qs.r[i])
        if t == 0:
            n_match = N
        elif t == 1:
            n_match = n_match_c
        elif t == 2:
            n_match = int(tm.sum())
        else:
            n_match = int(((ds.C == qs.v[i]) & tm).sum())
        print(f"  q{i}: type={t} matches={n_match}"
              + (f" range=[{qs.l[i]:.3f},{qs.r[i]:.3f}]" if t >= 2 else ""))


if __name__ == "__main__":
    main()
