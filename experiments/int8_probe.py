"""Feasibility probe: int8 MXU matmul through the axon relay (round-5 seed).

The v3 anatomy (DESIGN.md §3b) says the kernel is matmul-bound: the bf16
selection matmul runs ~8.9 ms/batch at D=10⁶ B=1024 and the epilogue is
only 24-33%. v5e rates int8 at 2× bf16 MACs, so a *certified int8
selection plane* (scale 127/6 per the generators' U[-6,6] dims; selection
error absorbed by a widened certificate slack exactly like the bf16
plane) is the one remaining 2× lever. Before building it: does an int8
dot_general compile and hit ~2× the bf16 rate here, at the selection
shapes — (B_block 256, 128) × (128, Dt 16384) over 61 tiles — in XLA and
in a Mosaic kernel shaped like v3's matmul stage?

Protocol per experiments/README.md: distinct inputs per repetition (the
relay serves same-args executions from cache), fetch-timed via
np.asarray (block_until_ready does not block through the relay), small
outputs (a (B,128) per-tile min-reduce, v3's bin shape).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B, K, Dt, NT = 256, 128, 16384, 61  # ~1e6 rows' worth of tiles
REPS = 5


def bench(name, fn, qs, d):
    np.asarray(fn(qs[0], d))                      # compile + warm (fetched)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = fn(qs[1 + i], d)                    # distinct inputs each rep
        np.asarray(out)                           # relay: only fetch waits
    dt = (time.perf_counter() - t0) / REPS
    flops = 2 * B * K * Dt * NT
    print(f"{name:26s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} Tops",
          flush=True)


@jax.jit
def mm_bf16(q, d):
    def step(acc, dt_):
        s = jax.lax.dot_general(q, dt_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.minimum(acc, jnp.min(s.reshape(B, 128, Dt // 128),
                                        axis=2)), None
    acc, _ = jax.lax.scan(step, jnp.full((B, 128), jnp.inf, jnp.float32), d)
    return acc                                    # (B, 128) — 128 KB fetch


@jax.jit
def mm_int8(q, d):
    def step(acc, dt_):
        s = jax.lax.dot_general(q, dt_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.minimum(acc, jnp.min(s.reshape(B, 128, Dt // 128),
                                        axis=2)), None
    acc, _ = jax.lax.scan(
        step, jnp.full((B, 128), jnp.iinfo(jnp.int32).max, jnp.int32), d)
    return acc


def make_mosaic(in_dtype, acc_dtype, cast_f32):
    """One (1,B,128) min-write per grid step — the exact kernel form that
    compiled through the relay in probe v1; only the dot dtype varies."""
    from jax.experimental import pallas as pl

    out_dtype = jnp.float32 if cast_f32 else acc_dtype

    def kern(q_ref, d_ref, o_ref):
        s = jax.lax.dot_general(
            q_ref[:], d_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        if cast_f32:
            s = s.astype(jnp.float32)
        o_ref[0] = jnp.min(s.reshape(B, 128, Dt // 128), axis=2)

    f = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((B, K), lambda t: (0, 0)),
            pl.BlockSpec((1, K, Dt), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, 128), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, B, 128), out_dtype),
    )

    @jax.jit
    def run(q, d):
        return f(q, d).min(axis=0)                # fetch stays 128 KB
    return run


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    qf = [jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
          for _ in range(REPS + 1)]
    df = jnp.asarray(rng.normal(size=(NT, K, Dt)), jnp.bfloat16)
    qi = [jnp.asarray(rng.integers(-127, 127, size=(B, K)), jnp.int8)
          for _ in range(REPS + 1)]
    di = jnp.asarray(rng.integers(-127, 127, size=(NT, K, Dt)), jnp.int8)
    bench("XLA bf16->f32 mm+min", mm_bf16, qf, df)
    bench("XLA int8->i32 mm+min", mm_int8, qi, di)
    for name, io in (
        ("Mosaic bf16 mm+min", (jnp.bfloat16, jnp.float32, False)),
        ("Mosaic int8->i32 mm+min", (jnp.int8, jnp.int32, False)),
        ("Mosaic int8->i32->f32", (jnp.int8, jnp.int32, True)),
        ("Mosaic int8->f32 mm", (jnp.int8, jnp.float32, False)),
    ):
        try:
            f = make_mosaic(*io)
            qs = qf if io[0] == jnp.bfloat16 else qi
            d = df if io[0] == jnp.bfloat16 else di
            bench(name, f, qs, d)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
