"""Result-fetch microbench: is the fetch wall round-trips or bandwidth?

The r4 flagship smoke puts search/fetch at 2995 ms of a 3475 ms wall —
86% of the large-set search is device->host result transfers through the
axon relay. Each engine fetch is one np.asarray(device_array) per pending
dispatch (~27 ms relay round trip measured in r2, plus bytes). This
microbench times, for N result-sized arrays already resident on device:

  1. sync loop        — np.asarray(a) one at a time (the shipping path)
  2. async-first loop — a.copy_to_host_async() for all, then np.asarray
  3. device concat    — one jitted concatenate, then ONE np.asarray

If (2) or (3) collapses the wall, the engines' fetch loop gets the same
treatment. Run on the real chip: python experiments/fetch_bench.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# result-bundle shape at the flagship config: query_batch=1024 rows,
# 24-bit-packed k=100 ids (75 lanes) + certificate column
B, COLS = 1024, 76
N_ARRAYS = 48


def make_arrays(n):
    f = jax.jit(lambda x, s: x + s)
    base = jnp.asarray(np.arange(B * COLS, dtype=np.int32).reshape(B, COLS))
    arrs = [f(base, jnp.int32(i)) for i in range(n)]
    for a in arrs:
        a.block_until_ready()
    return arrs


def bench(label, fn, n_runs=3):
    walls = []
    for _ in range(n_runs):
        arrs = make_arrays(N_ARRAYS)
        t0 = time.perf_counter()
        out = fn(arrs)
        walls.append(time.perf_counter() - t0)
        del out, arrs
    med = sorted(walls)[len(walls) // 2]
    mb = N_ARRAYS * B * COLS * 4 / 1e6
    print(
        f"{label:16s} median {med*1e3:8.1f} ms over {N_ARRAYS} arrays "
        f"({mb:.1f} MB) = {mb/med:6.1f} MB/s, "
        f"{med/N_ARRAYS*1e3:6.2f} ms/array   runs={['%.0f' % (w*1e3) for w in walls]}"
    )
    return med


def sync_loop(arrs):
    return [np.asarray(a) for a in arrs]


def async_first(arrs):
    for a in arrs:
        try:
            a.copy_to_host_async()
        except Exception:
            pass
    return [np.asarray(a) for a in arrs]


def device_get(arrs):
    return jax.device_get(arrs)


_concat = jax.jit(lambda xs: jnp.concatenate(xs, axis=0))


def concat_one(arrs):
    big = _concat(arrs)
    flat = np.asarray(big)
    return [flat[i * B : (i + 1) * B] for i in range(len(arrs))]


def main():
    print("device:", jax.devices()[0])
    # warm the concat program shape outside the timed runs
    warm = make_arrays(N_ARRAYS)
    _concat(warm).block_until_ready()
    del warm

    t_sync = bench("sync loop", sync_loop)
    t_async = bench("async first", async_first)
    t_get = bench("jax.device_get", device_get)
    t_concat = bench("device concat", concat_one)
    best = min(t_async, t_get, t_concat)
    print(
        f"\nbest alternative vs sync loop: {t_sync/best:.2f}x "
        f"({'async' if best == t_async else 'device_get' if best == t_get else 'concat'})"
    )


if __name__ == "__main__":
    main()
