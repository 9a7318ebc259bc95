"""Measure scan-step strategy costs on the real chip (medium scale).

Compares per-tile merge strategies for the streaming top-k scan and the
matmul-only ceiling, to decide the default configuration. Run:
    python experiments/topk_strategies.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = 256
DT = 8192
NT = 122            # ~1e6 rows
KP = 128

rng = np.random.default_rng(0)
Vt = jnp.asarray(rng.standard_normal((NT, DT, 128), dtype=np.float32))
dnt = jnp.asarray(rng.standard_normal((NT, DT)).astype(np.float32))
qV = jnp.asarray(rng.standard_normal((B, 128)).astype(np.float32))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_query_rows = NT * DT
    qps = B / best
    print(f"{name:28s} {best*1e3:9.1f} ms  -> {qps:9.0f} QPS @ {per_query_rows} rows",
          flush=True)
    return best


def scores_of(V_tile, precision):
    return dnt[0][None, :] - 2.0 * jax.lax.dot_general(
        qV, V_tile, (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


@jax.jit
def matmul_only_highest(Vt):
    def step(acc, V_tile):
        s = scores_of(V_tile, jax.lax.Precision.HIGHEST)
        return acc + jnp.sum(s, axis=1), None
    acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), Vt)
    return acc


@jax.jit
def matmul_only_default(Vt):
    def step(acc, V_tile):
        s = scores_of(V_tile, jax.lax.Precision.DEFAULT)
        return acc + jnp.sum(s, axis=1), None
    acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), Vt)
    return acc


def make_scan(merge):
    @jax.jit
    def run(Vt):
        init = (jnp.full((B, KP), jnp.inf), jnp.zeros((B, KP), jnp.int32))

        def step(carry, V_tile):
            s = scores_of(V_tile, jax.lax.Precision.HIGHEST)
            ids = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (1, DT), 1), (B, DT))
            return merge(carry, s, ids), None

        carry, _ = jax.lax.scan(step, init, Vt)
        return carry
    return run


def merge_topk(carry, s, ids):
    cs = jnp.concatenate([carry[0], s], axis=1)
    ci = jnp.concatenate([carry[1], ids], axis=1)
    v, idx = jax.lax.top_k(-cs, KP)
    return -v, jnp.take_along_axis(ci, idx, axis=1)


def merge_approx(carry, s, ids):
    cs = jnp.concatenate([carry[0], s], axis=1)
    ci = jnp.concatenate([carry[1], ids], axis=1)
    v, idx = jax.lax.approx_max_k(-cs, KP, recall_target=0.95)
    return -v, jnp.take_along_axis(ci, idx.astype(jnp.int32), axis=1)


def merge_binned(carry, s, ids):
    sb = s.reshape(B, DT // 128, 128)
    ib = ids.reshape(B, DT // 128, 128)
    arg = jnp.argmin(sb, axis=2, keepdims=True)
    smin = jnp.take_along_axis(sb, arg, axis=2)[..., 0]
    imin = jnp.take_along_axis(ib, arg, axis=2)[..., 0]
    cs = jnp.concatenate([carry[0], smin], axis=1)
    ci = jnp.concatenate([carry[1], imin], axis=1)
    v, idx = jax.lax.top_k(-cs, KP)
    return -v, jnp.take_along_axis(ci, idx, axis=1)


def merge_binned_approx(carry, s, ids):
    sb = s.reshape(B, DT // 128, 128)
    ib = ids.reshape(B, DT // 128, 128)
    arg = jnp.argmin(sb, axis=2, keepdims=True)
    smin = jnp.take_along_axis(sb, arg, axis=2)[..., 0]
    imin = jnp.take_along_axis(ib, arg, axis=2)[..., 0]
    cs = jnp.concatenate([carry[0], smin], axis=1)
    ci = jnp.concatenate([carry[1], imin], axis=1)
    v, idx = jax.lax.approx_max_k(-cs, KP, recall_target=0.95)
    return -v, jnp.take_along_axis(ci, idx.astype(jnp.int32), axis=1)


@jax.jit
def deferred_binned(Vt):
    """Per-tile bin minima collected, ONE top-k at the end (no carry merge)."""
    def step(_, V_tile):
        s = scores_of(V_tile, jax.lax.Precision.HIGHEST)
        sb = s.reshape(B, DT // 128, 128)
        arg = jnp.argmin(sb, axis=2, keepdims=True)
        smin = jnp.take_along_axis(sb, arg, axis=2)[..., 0]
        amin = arg[..., 0].astype(jnp.int32)
        return None, (smin, amin)

    _, (smins, amins) = jax.lax.scan(step, None, Vt)   # (NT, B, DT//128)
    smins = jnp.moveaxis(smins, 0, 1).reshape(B, NT * (DT // 128))
    v, idx = jax.lax.top_k(-smins, KP)
    return -v, idx


if __name__ == "__main__":
    print(f"B={B} DT={DT} NT={NT} rows={NT*DT}", flush=True)
    timeit("matmul_only HIGHEST", matmul_only_highest, Vt)
    timeit("matmul_only DEFAULT", matmul_only_default, Vt)
    timeit("scan merge=topk", make_scan(merge_topk), Vt)
    timeit("scan merge=approx_max_k", make_scan(merge_approx), Vt)
    timeit("scan merge=binned+topk", make_scan(merge_binned), Vt)
    timeit("scan merge=binned+approx", make_scan(merge_binned_approx), Vt)
    timeit("deferred binned", deferred_binned, Vt)
