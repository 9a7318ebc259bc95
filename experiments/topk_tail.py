"""Is the final top_k over the candidate stream worth a 2nd-level reduce?

Times (fetch-based, distinct inputs) three tails over a (B, W) stream
shaped like the medium set's (B=1024, W=123*3*64=23616):

  a) lax.top_k(128) directly
  b) packed 8-per-128-lane-bin reduce, then top_k(128) over 8*W/128
  c) no tail (control: stream generation cost)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/topk_tail.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("TT_B", 1024))
W = int(os.environ.get("TT_W", 123 * 3 * 64))
REPS = 4
BIN = 128


def tail_topk(d):
    top_neg, idx = jax.lax.top_k(-d, 128)
    return -top_neg, idx


def tail_binned(d):
    Wp = (d.shape[1] + BIN - 1) // BIN * BIN
    d = jnp.pad(d, ((0, 0), (0, Wp - d.shape[1])), constant_values=jnp.inf)
    bins2 = Wp // BIN
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins2, BIN), 2)
    packed = (
        jax.lax.bitcast_convert_type(
            d.reshape(B, bins2, BIN), jnp.int32
        ) & jnp.int32(~0x7F)
    ) | lane
    outs = []
    for rnd in range(8):
        m = jnp.min(packed, axis=2)
        outs.append(m)
        if rnd < 7:
            packed = jnp.where(
                lane == (m & jnp.int32(0x7F))[:, :, None],
                jnp.int32(0x7F800000), packed,
            )
    keys = jnp.stack(outs, 1)                        # (B, 8, bins2)
    colb = jax.lax.broadcasted_iota(jnp.int32, (1, 8, bins2), 2)
    col = (colb * BIN + (keys & jnp.int32(0x7F))).reshape(B, 8 * bins2)
    d2 = jax.lax.bitcast_convert_type(
        keys & jnp.int32(~0x7F), jnp.float32
    ).reshape(B, 8 * bins2)
    top_neg, idx = jax.lax.top_k(-d2, 128)
    return -top_neg, jnp.take_along_axis(col, idx, axis=1)


def main():
    key = jax.random.PRNGKey(0)
    streams = [
        # low 7 mantissa bits zeroed, as the packed scan emits
        jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(
                jax.random.uniform(k, (B, W), jnp.float32, 1.0, 4000.0),
                jnp.int32,
            ) & jnp.int32(~0x7F),
            jnp.float32,
        )
        for k in jax.random.split(key, REPS)
    ]
    streams = [jax.device_put(s) for s in streams]
    jax.block_until_ready(streams)

    for name, tail in (("topk", tail_topk), ("binned8+topk", tail_binned),
                       ("control_min", lambda d: (jnp.min(d, 1), None))):
        fn = jax.jit(lambda d: tail(d)[0])
        t0 = time.perf_counter()
        _ = np.asarray(fn(streams[-1]))
        print(f"{name}: compile+1st {time.perf_counter()-t0:.1f} s",
              flush=True)
        ts = []
        for s in streams:
            t0 = time.perf_counter()
            _ = np.asarray(fn(s))
            ts.append(time.perf_counter() - t0)
        print(f"{name:14s} {1e3*min(ts):7.2f} ms/batch", flush=True)

    # correctness: same top-100 value multiset
    a = np.sort(np.asarray(tail_topk(streams[0])[0])[:, :100], axis=1)
    b = np.sort(np.asarray(tail_binned(streams[0])[0])[:, :100], axis=1)
    print("binned == topk (values):", np.array_equal(a, b), flush=True)


if __name__ == "__main__":
    main()
