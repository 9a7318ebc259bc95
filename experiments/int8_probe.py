"""Feasibility probe: int8 MXU matmul through the axon relay (round-5 seed).

The v3 anatomy (DESIGN.md §3b) says the kernel is matmul-bound: the bf16
selection matmul runs ~8.9 ms/batch at D=10⁶ B=1024 and the epilogue is
only 24-33%. v5e rates int8 at 2× bf16 MACs, so a *certified int8
selection plane* (scale 127/6 per the generators' U[-6,6] dims; selection
error absorbed by a widened certificate slack exactly like the bf16
plane) is the one remaining 2× lever. Before building it: does an int8
dot_general compile and hit the 2× rate here at the selection shapes —
(B_block 256, 128) × (128, Dt 16384) — in XLA and in a Mosaic kernel?

Run:  PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_probe.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B, K, Dt, NT = 256, 128, 16384, 61  # ~1e6 rows' worth of tiles


def bench(name, fn, *args):
    fn(*args)[0].block_until_ready()                      # compile + warm
    reps = 5
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    np.asarray(outs[-1][0])                               # relay: fetch waits
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * B * K * Dt * NT
    print(f"{name:28s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:6.1f} Tops",
          flush=True)


@jax.jit
def mm_bf16(q, d):
    def step(acc, dt_):
        s = jax.lax.dot_general(q, dt_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + jnp.sum(s), None
    acc, _ = jax.lax.scan(step, jnp.float32(0), d)
    return acc[None]


@jax.jit
def mm_int8(q, d):
    def step(acc, dt_):
        s = jax.lax.dot_general(q, dt_, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + jnp.sum(s), None
    acc, _ = jax.lax.scan(step, jnp.int32(0), d)
    return acc[None]


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
    df = jnp.asarray(rng.normal(size=(NT, K, Dt)), jnp.bfloat16)
    qi = jnp.asarray(rng.integers(-127, 127, size=(B, K)), jnp.int8)
    di = jnp.asarray(rng.integers(-127, 127, size=(NT, K, Dt)), jnp.int8)
    bench("XLA bf16->f32 scan-mm", mm_bf16, qf, df)
    bench("XLA int8->i32 scan-mm", mm_int8, qi, di)

    # Mosaic: one matmul grid step per (tile), int8 in VMEM
    from jax.experimental import pallas as pl

    def kern_i8(q_ref, d_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            q_ref[:], d_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def kern_bf16(q_ref, d_ref, o_ref):
        o_ref[0] = jax.lax.dot_general(
            q_ref[:], d_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for name, kern, qq, dd, ot in (
        ("Mosaic bf16 kernel mm", kern_bf16, qf, df, jnp.float32),
        ("Mosaic int8 kernel mm", kern_i8, qi, di, jnp.int32),
    ):
        try:
            f = pl.pallas_call(
                kern,
                grid=(NT,),
                in_specs=[
                    pl.BlockSpec((B, K), lambda t: (0, 0)),
                    pl.BlockSpec((1, K, Dt), lambda t: (t, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, B, Dt), lambda t: (t, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((NT, B, Dt), ot),
            )

            @jax.jit
            def run(q, d, f=f):
                o = f(q, d)
                return jnp.sum(o, dtype=jnp.float32)[None],

            bench(name, run, qq, dd)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
