"""Per-section cost split INSIDE the pallas_v3 fused kernel (VERDICT r3 #1).

v3 wins +52% over xla_packed at D=10⁶/B=1024 yet one batch still costs
~60 ms where the bf16 matmul prices at ~4 ms and a VPU op count at <10 ms.
Ablation kernels isolate each stage — every variant keeps a data dependency
on the stage's result (the per-bin min is written out), so nothing DCEs:

  mm        3-pass bf16 matmul only, min over raw qd
  dist      + dn/qn fold + clamp
  mask      + predicate mask (no packing)
  pack      dist + packed keys, R rounds, NO mask
  full_R{n} the shipping kernel at bin_top=n
  bf16_*    same with the bf16 scan plane (single-pass matmul)

Run:  PYTHONPATH=/root/repo python experiments/v3_anatomy.py
"""
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

B = int(os.environ.get("V3A_B", 1024))
G = int(os.environ.get("V3A_G", 4))
DT = int(os.environ.get("V3A_DT", 16384))
NT = int(os.environ.get("V3A_NT", 61))
BB = int(os.environ.get("V3A_BB", 256))
REPS = int(os.environ.get("V3A_REPS", 3))
NROWS = NT * DT
BIN = 128


ALPHA_I8 = (6.0 / 127.0) ** 2  # int8 plane dequant scale (U[-6,6] dims)


def make_kernel(stage: str, bin_top: int, bf16_plane):
    def _kernel(sn_ref, V_ref, C_ref, T_ref, dn_ref, oid_ref,
                qhi_ref, qlo_ref, qn_ref,
                ac_ref, v_ref, at_ref, l_ref, r_ref, out_ref):
        Dt = V_ref.shape[0]
        Bb = qhi_ref.shape[0]
        bins = Dt // BIN

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        if bf16_plane == "int8":
            # int8 MXU pass; Mosaic requires the i32 accumulator (the
            # f32-preferred int8 dot fails remote compile, int8_probe.py)
            qd = jax.lax.dot_general(
                qhi_ref[:], V_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * jnp.float32(ALPHA_I8)
        elif bf16_plane:
            qd = mm(qhi_ref[:], V_ref[:])
        else:
            V = V_ref[:]
            Vhi = V.astype(jnp.bfloat16)
            Vlo = (V - Vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            qd = mm(qhi_ref[:], Vhi) + mm(qhi_ref[:], Vlo) + mm(qlo_ref[:], Vhi)
        if stage == "mm":
            out_ref[:, :bins] = jax.lax.bitcast_convert_type(
                jnp.min(qd.reshape(Bb, BIN, bins), axis=1), jnp.int32)
            for rnd in range(1, bin_top):
                out_ref[:, rnd * bins:(rnd + 1) * bins] = 0
            return
        if stage.startswith("mmc"):
            # chunked MXU→min pipeline: dot CH columns at a time and
            # min-reduce each chunk immediately, so the (Bb, Dt) f32
            # score tile never materializes whole — probes whether the
            # VMEM round-trip of the full tile is the "mm" leg's cost
            CH = int(stage[3:])
            nch = Dt // CH
            bch = CH // BIN
            for c in range(nch):
                Vc = V_ref[pl.ds(c * CH, CH), :]
                if bf16_plane == "int8":
                    qd_c = jax.lax.dot_general(
                        qhi_ref[:], Vc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                else:
                    qd_c = mm(qhi_ref[:], Vc)
                out_ref[:, c * bch:(c + 1) * bch] = (
                    jax.lax.bitcast_convert_type(
                        jnp.min(qd_c.reshape(Bb, BIN, bch), axis=1),
                        jnp.int32))
            for rnd in range(1, bin_top):
                out_ref[:, rnd * bins:(rnd + 1) * bins] = 0
            return
        if stage == "mmb":
            # same single MXU pass, min-reduce on a bf16 copy of the score
            # tile: if Mosaic packs bf16 2-per-lane on the VPU, the
            # epilogue (the real cost of the "mm" leg) should halve
            m = jnp.min(qd.astype(jnp.bfloat16).reshape(Bb, BIN, bins),
                        axis=1)
            out_ref[:, :bins] = jax.lax.bitcast_convert_type(
                m.astype(jnp.float32), jnp.int32)
            for rnd in range(1, bin_top):
                out_ref[:, rnd * bins:(rnd + 1) * bins] = 0
            return
        dist = jnp.maximum(dn_ref[0, :][None, :] - 2.0 * qd + qn_ref[:], 0.0)
        if stage == "dist":
            out_ref[:, :bins] = jax.lax.bitcast_convert_type(
                jnp.min(dist.reshape(Bb, BIN, bins), axis=1), jnp.int32)
            for rnd in range(1, bin_top):
                out_ref[:, rnd * bins:(rnd + 1) * bins] = 0
            return
        if stage in ("mask", "full"):
            ok = oid_ref[0, :][None, :] < sn_ref[0]
            ok &= jnp.logical_or(ac_ref[:] == 0,
                                 C_ref[0, :][None, :] == v_ref[:])
            ok &= jnp.logical_or(
                at_ref[:] == 0,
                jnp.logical_and(T_ref[0, :][None, :] >= l_ref[:],
                                T_ref[0, :][None, :] <= r_ref[:]))
            dist = jnp.where(ok, dist, jnp.inf)
        if stage == "mask":
            out_ref[:, :bins] = jax.lax.bitcast_convert_type(
                jnp.min(dist.reshape(Bb, BIN, bins), axis=1), jnp.int32)
            for rnd in range(1, bin_top):
                out_ref[:, rnd * bins:(rnd + 1) * bins] = 0
            return
        # pack / full: packed keys + R sublane-axis rounds
        d3 = dist.reshape(Bb, BIN, bins)
        slice_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, BIN, bins), 1)
        packed = (pltpu.bitcast(d3, jnp.int32) & jnp.int32(~0x7F)) | slice_iota
        for rnd in range(bin_top):
            m = jnp.min(packed, axis=1)
            out_ref[:, rnd * bins:(rnd + 1) * bins] = m
            if rnd + 1 < bin_top:
                packed = jnp.where(
                    slice_iota == (m & jnp.int32(0x7F))[:, None, :],
                    jnp.int32(0x7F800000), packed)

    return _kernel


@functools.partial(jax.jit, static_argnames=("stage", "bin_top", "plane"))
def scan(Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
         stage="full", bin_top=2, plane=False):
    bins = DT // BIN
    out_w = bin_top * bins
    nb = B // BB
    qf32 = qV.astype(jnp.float32)
    if plane == "int8":
        qhi = jnp.clip(jnp.round(qf32 * (127.0 / 6.0)), -127, 127
                       ).astype(jnp.int8)
        qlo = jnp.zeros_like(qhi)
    else:
        qhi = qf32.astype(jnp.bfloat16)
        qlo = (qf32 - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    qn = jnp.sum(qf32 * qf32, axis=1, keepdims=True)

    tile_row = lambda i, b, *_: (i, 0)
    tile_col = lambda i, b, *_: (0, i)
    qrow = lambda i, b, *_: (b, 0)
    out_ix = lambda i, b, *_: (b, i)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NT, nb),
        in_specs=[
            pl.BlockSpec((DT, 128), tile_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DT), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DT), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DT), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DT), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 128), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 128), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), qrow, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BB, out_w), out_ix, memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        make_kernel(stage, bin_top, plane),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NT * out_w), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(jnp.asarray(sn, jnp.int32).reshape(1),
      Vp, C.reshape(1, -1), T.reshape(1, -1), dn.reshape(1, -1),
      oid.reshape(1, -1), qhi, qlo, qn,
      ac.astype(jnp.int32).reshape(B, 1), v.reshape(B, 1),
      at.astype(jnp.int32).reshape(B, 1), l.reshape(B, 1), r.reshape(B, 1))
    return jnp.sum(out)


@functools.partial(jax.jit, static_argnames=("stage", "bin_top", "plane"))
def group(db, qVg, ac, v, at, l, r, sn, stage="full", bin_top=2, plane=False):
    Vp, C, T, dn, oid = db

    def gstep(_, qV):
        return None, scan(Vp, C, T, dn, oid, qV, ac, v, at, l, r, sn,
                          stage=stage, bin_top=bin_top, plane=plane)

    _, sums = jax.lax.scan(gstep, None, qVg)
    return jnp.sum(sums)


def main():
    print(f"device: {jax.devices()[0]} rows={NROWS} B={B} G={G} "
          f"DT={DT} BB={BB}", flush=True)
    key = jax.random.PRNGKey(0)
    kV, kC, kT, *kq = jax.random.split(key, 3 + REPS + 1)
    Vp = jax.random.normal(kV, (NROWS, 128), jnp.float32)
    Vb = Vp.astype(jnp.bfloat16)
    C = jnp.floor(jax.random.uniform(kC, (NROWS,), maxval=1000.0))
    T = jax.random.uniform(kT, (NROWS,), minval=-3.0, maxval=3.0)
    dn = jnp.sum(Vp * Vp, axis=1)
    oid = jnp.arange(NROWS, dtype=jnp.int32)
    qGs = [jax.random.normal(k, (G, B, 128), jnp.float32) for k in kq]
    kb = jax.random.split(jax.random.PRNGKey(9), 5)
    ac = jax.random.uniform(kb[0], (B,)) < 0.5
    at = jax.random.uniform(kb[1], (B,)) < 0.5
    v = jnp.floor(jax.random.uniform(kb[2], (B,), maxval=1000.0))
    l = jax.random.uniform(kb[3], (B,), minval=-3.0, maxval=0.0)
    r = jax.random.uniform(kb[4], (B,), minval=0.0, maxval=3.0)
    sn = jnp.int32(NROWS)
    np.asarray(jnp.sum(Vp))
    GB = NROWS * 512 / 1e9

    Vi8 = jnp.clip(jnp.round(Vp * (127.0 / 6.0)), -127, 127).astype(jnp.int8)

    def timeit(name, stage, bin_top, plane):
        Vsel = Vi8 if plane == "int8" else (Vb if plane else Vp)
        db = (Vsel, C, T, dn, oid)
        t0 = time.perf_counter()
        np.asarray(group(db, qGs[0], ac, v, at, l, r, sn,
                         stage=stage, bin_top=bin_top, plane=plane))
        first = time.perf_counter() - t0
        ts = []
        for i in range(1, REPS + 1):
            t0 = time.perf_counter()
            np.asarray(group(db, qGs[i], ac, v, at, l, r, sn,
                             stage=stage, bin_top=bin_top, plane=plane))
            ts.append(time.perf_counter() - t0)
        per_b = min(ts) / G
        print(f"{name:26s} {per_b * 1e3:7.2f} ms/batch {GB / per_b:6.1f} GB/s"
              f" {B / per_b:8.0f} QPS  walls={[f'{t*1e3:.0f}' for t in ts]}"
              f" (first {first:.0f}s)", flush=True)

    specs = [
        ("mm (3-pass bf16)", "mm", 1, False),
        ("dist", "dist", 1, False),
        ("mask", "mask", 1, False),
        ("pack R2 nomask", "pack", 2, False),
        ("full R1", "full", 1, False),
        ("full R2 (ship)", "full", 2, False),
        ("full R4", "full", 4, False),
        ("bf16 mm (1-pass)", "mm", 1, True),
        ("bf16 full R2", "full", 2, True),
        ("bf16 full R4", "full", 4, True),
        ("int8 mm (1-pass)", "mm", 1, "int8"),
        ("int8 full R2", "full", 2, "int8"),
        ("bf16 mm+bf16min", "mmb", 1, True),
        ("bf16 mm chunked 2048", "mmc2048", 1, True),
        ("bf16 mm chunked 4096", "mmc4096", 1, True),
    ]
    for name, stage, bin_top, plane in specs:
        try:
            timeit(name, stage, bin_top, plane)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
