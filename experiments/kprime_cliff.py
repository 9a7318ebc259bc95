"""Isolate the k'=240/256 selection cliff (VERDICT r4 #5, real chip).

Round 4 measured (experiments/flagship_tune.py, twice, two sessions): at
the single-dispatch-group regime (D=10⁷ mixed, M=8192) every k' below 256
beats 256 by ~15% — 8809/8686/8387 QPS at 240/224/208 vs 7687 at 256 —
with R and level-2 round counts IDENTICAL across 192-256 and the rerun
phase flat. The k' default shipped as 240 on "never worse", cause open.

This script stage-isolates every k'-dependent op at the flagship's exact
shapes (B=1024, dense stream W = R·n_pad/128 at D=10⁷ → level-2 output
rounds·bins2) and sweeps k' across the cliff:

  l2+topk   — binned_stream_topk(stream, k'): the level-2 packed reduce
              + the final lax.top_k(k') over its (B, rounds·bins2) output
  topk_only — lax.top_k(k') alone on a (B, rounds·bins2) f32 block
  refine    — gather k' rows from a resident (n_tile, 128) plane + exact
              fp32 distances + lax.top_k(100) over the k' survivors

plus an end-to-end A/B of the shipped flagship config at k'=240 vs 256
(same session, same data) to confirm the cliff reproduces before trusting
the attribution.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/kprime_cliff.py
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("KC_B", 1024))
N = int(os.environ.get("KC_N", 10_000_000))
REPS = int(os.environ.get("KC_REPS", 5))
KPS = tuple(
    int(x)
    for x in os.environ.get(
        "KC_KPS", "192,224,240,248,252,256,260,272,288"
    ).split(",")
)
E2E = os.environ.get("KC_E2E", "1") == "1"


def timeit(fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(walls))


def main():
    from hvq_tpu.ops.distance import exact_distances
    from hvq_tpu.ops.topk import binned_stream_topk

    R = 3
    W = R * (N // 128)                  # dense candidate stream width
    Wp = -(-W // 128) * 128
    bins2 = Wp // 128
    rounds = 8
    W2 = rounds * bins2
    print(f"B={B} N={N} stream W={W} level2 out W2={W2}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    out_s = jax.random.uniform(k1, (B, W), jnp.float32, 1.0, 100.0)
    out_i = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[None, :], (B, W)
    )
    d2 = jax.random.uniform(k2, (B, W2), jnp.float32, 1.0, 100.0)
    plane = jax.random.normal(k3, (1 << 17, 128), jnp.float32)
    qV = jax.random.normal(k1, (B, 128), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("kp",))
    def l2_sel(s, i, kp):
        return binned_stream_topk(s, i, kp, rounds=rounds)

    @functools.partial(jax.jit, static_argnames=("kp",))
    def topk_only(d, kp):
        return jax.lax.top_k(-d, kp)

    @functools.partial(jax.jit, static_argnames=("kp",))
    def refine(pos, q, kp):
        rows = jnp.take(plane, pos[:, :kp], axis=0)
        ex = exact_distances(q, rows)
        return jax.lax.top_k(-ex, 100)

    pos = jnp.broadcast_to(
        jnp.arange(512, dtype=jnp.int32)[None, :], (B, 512)
    ) % (1 << 17)

    print(f"{'kp':>4} | {'l2+topk':>9} | {'topk_only':>9} | {'refine':>8}",
          flush=True)
    for kp in KPS:
        t_l2 = timeit(l2_sel, out_s, out_i, kp)
        t_tk = timeit(topk_only, d2, kp)
        t_rf = timeit(refine, pos, qV, kp)
        print(
            f"{kp:>4} | {t_l2:7.2f} ms | {t_tk:7.2f} ms | {t_rf:6.2f} ms",
            flush=True,
        )

    if not E2E:
        return
    # free the ~2 GB of microbench device arrays before the 10⁷-row index
    # build (they OOM the chip otherwise)
    del out_s, out_i, d2, plane, qV, pos
    # end-to-end cliff reproduction under the shipped flagship config
    import gc

    gc.collect()

    from hvq_tpu.index.partition import PartitionedIndex
    from hvq_tpu.models.partitioned import PartitionedEngine
    from hvq_tpu.utils.generators import generate_dataset, generate_queries

    ds = generate_dataset(N, seed=0, categories=1000)
    qs = generate_queries(8192, seed=7, categories=1000, centers_seed=0)
    # one shared device index: k' is engine-side; per-engine rebuilds OOM
    # the chip while the previous engine's buffers drain
    index = PartitionedIndex.build(ds, db_tile=16384, scan_store="bf16")
    for kp in (240, 256, 240, 256):
        gc.collect()
        eng = PartitionedEngine(ds, index=index, kprime=kp)
        eng.search(qs, return_dists=False)          # warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            eng.search(qs, return_dists=False)
            walls.append(time.perf_counter() - t0)
        w = float(np.median(walls))
        print(
            f"e2e flagship k'={kp}: {8192/w:7.0f} QPS "
            f"({[f'{8192/x:.0f}' for x in walls]})",
            flush=True,
        )
        del eng


if __name__ == "__main__":
    main()
