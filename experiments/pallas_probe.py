"""Probe the fused packed Pallas kernel on the real chip vs xla_packed.

Round-1 finding was that Mosaic compiles hang in the axon relay; as of
2026-08-16 (this probe) trivial kernels compile fine — re-test the real
kernel. Run standalone:

    PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python experiments/pallas_probe.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("PROBE_B", 256))
DT = int(os.environ.get("PROBE_DT", 8192))
NT = int(os.environ.get("PROBE_NT", 128))      # ~1e6 rows


def _trivial(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def main():
    print("device:", jax.devices()[0], flush=True)
    x = jnp.ones((256, 128), jnp.float32)
    t0 = time.perf_counter()
    pl.pallas_call(
        _trivial, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x).block_until_ready()
    print(f"trivial pallas kernel OK in {time.perf_counter() - t0:.1f}s",
          flush=True)

    from hvq_tpu.ops.pallas_scan import (
        deferred_packed_scan_xla,
        fused_packed_scan,
        kernel_bin_top,
    )

    n_pad = NT * DT
    R = kernel_bin_top(DT, n_pad)
    print(f"B={B} DT={DT} NT={NT} rows={n_pad} bin_top={R}", flush=True)
    rng = np.random.default_rng(0)
    Vp = jnp.asarray(rng.standard_normal((n_pad, 128)).astype(np.float32))
    C = jnp.asarray(rng.integers(0, 1000, n_pad).astype(np.float32))
    T = jnp.asarray(rng.uniform(-3, 3, n_pad).astype(np.float32))
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(n_pad, dtype=jnp.int32)
    qV = jnp.asarray(rng.standard_normal((B, 128)).astype(np.float32))
    ac = jnp.asarray(rng.random(B) < 0.5)
    at = jnp.asarray(rng.random(B) < 0.5)
    v = jnp.asarray(rng.integers(0, 1000, B).astype(np.float32))
    l = jnp.asarray(rng.uniform(-3, 0, B).astype(np.float32))
    r = jnp.asarray(rng.uniform(0, 3, B).astype(np.float32))
    args = (Vp, C, T, dn, oid, qV, ac, v, at, l, r, jnp.int32(n_pad))

    def timeit(name, fn, iters=5):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        print(f"{name}: first call {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        qps = B / best
        print(f"{name:24s} {best * 1e3:8.2f} ms  -> {qps:9.0f} QPS(scan-only)",
              flush=True)
        return out

    import functools

    xla_jit = jax.jit(
        functools.partial(deferred_packed_scan_xla, db_tile=DT, bin_top=R)
    )
    s_x, i_x = timeit("xla_packed", lambda: xla_jit(*args))
    s_p, i_p = timeit(
        "pallas_packed",
        lambda: fused_packed_scan(*args, db_tile=DT, bin_top=R),
    )
    same = np.isclose(np.asarray(s_p), np.asarray(s_x))
    fin = np.isfinite(np.asarray(s_p))
    print("dist agree:", float((same | ~fin).mean()),
          " id agree(on same):",
          float((np.asarray(i_p)[same & fin] ==
                 np.asarray(i_x)[same & fin]).mean()), flush=True)


if __name__ == "__main__":
    main()
