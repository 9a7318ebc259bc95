"""Pallas fused scan kernel — the `dist_to_query`+`check_add` fusion reborn.

The reference's hot loop fuses predicate test, distance, and top-K insert in
registers (include/optimized_impl.h:284-335). The XLA scan path materializes
each (B, Dt) score tile in HBM and runs a costly per-tile top-k; measured on
chip (experiments/topk_strategies.py) selection costs 12× the matmul. This
kernel fuses the whole tile step on-core:

    V tile  ──HBM→VMEM (auto-pipelined)──►  MXU: ‖d‖² − 2·Q·Vᵀ   (B, Dt)
    C/T tiles ─────────────────────────►  VPU: predicate mask, +inf fill
                                          VPU: top-2 per 128-lane bin
    HBM write: only (B, 2·Dt/128) minima + their global ids

so HBM traffic is one read of the database per query batch plus a tiny
candidate stream — within ~2× of the pure-matmul ceiling. The final top-k'
over all surviving bin candidates runs outside (one `lax.top_k` per batch),
followed by the standard exact refinement.

Keeping the best R entries per 128-lane bin makes losing a true top-k'
candidate require R+1 of the top-k' to share one bin; ``choose_bin_top``
picks R from a Poisson tail bound so the expected loss is < 1e-4 per query
(tests gate recall = 1.0; the certified-exact ``lax.top_k`` streaming path
remains available as scan_impl="xla").

The same algorithm is also expressed in pure XLA here:
``deferred_bin_scan_xla`` (plain) and ``deferred_packed_scan_xla`` (packed
distance+lane keys — single min-reduce per bin round, arithmetic candidate
ids; the default TPU path while this environment's relay can't compile
Mosaic kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIN = 128  # lane-group width of the partial reduce


def _poisson_tail(lam: float, j: int) -> float:
    """P(X ≥ j) for X ~ Poisson(lam), summed to convergence."""
    import math

    if j <= 0:
        return 1.0
    term = math.exp(-lam) * lam ** j / math.factorial(j)
    total = 0.0
    for i in range(200):
        total += term
        term *= lam / (j + i + 1)
        if term < total * 1e-12:
            break
    return total


def choose_bin_top(
    n_pad: int, kprime: int = 128, certified: bool = False
) -> int | None:
    """Pick R (entries kept per bin) so expected candidate loss is tiny.

    Losing a true top-k' candidate needs R+1 of the k' to share one bin;
    with bins = n/128 and X ~ Poisson(k'/bins), E[lost] ≈ bins·P(X ≥ R+1).

    ``certified=False`` (legacy): returns None when no reasonable R keeps the
    expected loss < 1e-4 (small n → use the exact XLA path).

    ``certified=True``: the engine carries a device-side exactness
    certificate (BatchedEngine) and re-runs COMPACTED suspect queries
    (first at 2R, then through the exact path), so R only controls cost,
    not correctness. Two distinct rates matter:

    - *loss* rate bins·P(X ≥ R+1) — a candidate actually dropped; the
      rerun is what restores exactness. Target < 1e-4 per query (the loop
      condition below).
    - *flag* rate bins·P(X ≥ R) — a bin SATURATED at the t-threshold
      (kept exactly R below t; nothing provably lost, but the device
      can't tell). This is the rerun frequency the engine pays: ≈2.7e-3
      per query at D=10⁶/R=3 (experiments/suspect_anatomy.py measured
      31/10⁴ vs this model's 27), ≈6.4e-2 at D=10⁷/R=2. With suspects
      compacted into fresh batches this costs well under the ~15-25% a
      uniformly deeper R would (scan cost grows with the stream width
      nt·R·bins), so R is tuned on the loss bound, not the flag rate.

    The ladder extends far enough to cover small databases (bins ≥ 16).
    """
    bins = n_pad // BIN
    if bins < 1:
        return None
    lam = kprime / bins

    if certified:
        for R in (2, 3, 4, 6, 8, 10, 12, 16, 24, 32, 48, 64, 96, 128):
            if R * bins < 2 * kprime:
                continue
            if bins * _poisson_tail(lam, R + 1) < 1e-4:
                return min(R, BIN)
        return BIN if bins * BIN >= n_pad else None  # keep everything
    for R in (2, 3, 4, 8):
        if R * bins < 4 * kprime:
            continue
        if bins * _poisson_tail(lam, R + 1) < 1e-4:
            return R
    return None


def _make_kernel(bin_top: int):
    def _kernel(
        sn_ref,                       # SMEM scalar-prefetch: scan limit
        V_ref, C_ref, T_ref, dn_ref,  # (Dt,128), (1,Dt), (1,Dt), (1,Dt)
        oid_ref,                      # (1, Dt) int32 original ids (or positions)
        qV_ref,                       # (B, 128) query block (replicated)
        ac_ref, v_ref, at_ref, l_ref, r_ref,  # (B, 1) predicate fields
        out_s_ref, out_i_ref,         # (B, bin_top*Dt/BIN) per-tile outputs
    ):
        Dt = V_ref.shape[0]
        B = qV_ref.shape[0]
        bins = Dt // BIN

        # MXU: scores = ‖d‖² − 2·q·d  (fp32-faithful)
        qd = jax.lax.dot_general(
            qV_ref[:], V_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        scores = dn_ref[0, :][None, :] - 2.0 * qd            # (B, Dt)

        # VPU: fused predicate mask (reference optimized.hpp:84-117 as algebra)
        oid = oid_ref[0, :][None, :]                          # (1, Dt)
        ok = oid < sn_ref[0]
        ok &= jnp.logical_or(ac_ref[:] == 0, C_ref[0, :][None, :] == v_ref[:])
        ok &= jnp.logical_or(
            at_ref[:] == 0,
            jnp.logical_and(T_ref[0, :][None, :] >= l_ref[:],
                            T_ref[0, :][None, :] <= r_ref[:]),
        )
        scores = jnp.where(ok, scores, jnp.inf)

        # VPU: top-R per 128-lane bin (min, mask, repeat)
        s3 = scores.reshape(B, bins, BIN)
        gid3 = jnp.broadcast_to(
            oid_ref[0, :].reshape(1, bins, BIN), (B, bins, BIN)
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, bins, BIN), 2)
        for rnd in range(bin_top):
            a = jnp.argmin(s3, axis=2)
            m = jnp.min(s3, axis=2)
            i = jnp.take_along_axis(gid3, a[:, :, None], axis=2)[..., 0]
            out_s_ref[:, rnd * bins : (rnd + 1) * bins] = m
            out_i_ref[:, rnd * bins : (rnd + 1) * bins] = i
            if rnd + 1 < bin_top:
                s3 = jnp.where(lane == a[:, :, None], jnp.inf, s3)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("db_tile", "bin_top", "interpret")
)
def fused_bin_scan(
    Vp: jnp.ndarray,       # (n_pad, 128) float32
    C: jnp.ndarray,        # (n_pad,)
    T: jnp.ndarray,        # (n_pad,)
    dn: jnp.ndarray,       # (n_pad,) ‖d‖²
    oid: jnp.ndarray,      # (n_pad,) int32 ids reported for each row
    qV: jnp.ndarray,       # (B, 128) float32
    active_c: jnp.ndarray, v: jnp.ndarray,
    active_t: jnp.ndarray, l: jnp.ndarray, r: jnp.ndarray,
    sn: jnp.ndarray,       # () int32
    db_tile: int = 2048,
    bin_top: int = 2,
    interpret: bool = False,
):
    """Masked-distance candidate generation. Returns (scores, ids), each
    (B, nt · bin_top · db_tile/128), +inf marking masked/empty slots."""
    n_pad, d = Vp.shape
    if n_pad % db_tile:
        raise ValueError(f"n_pad {n_pad} not divisible by db_tile {db_tile}")
    if db_tile % BIN:
        raise ValueError(f"db_tile {db_tile} not divisible by bin {BIN}")
    nt = n_pad // db_tile
    B = qV.shape[0]
    bins = db_tile // BIN
    out_w = bin_top * bins

    col = lambda i, *_: (0, i)           # queries replicated across grid steps
    row = lambda i, *_: (i, 0)           # database tiles marching down the rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((db_tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, out_w), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, out_w), col, memory_space=pltpu.VMEM),
        ],
    )

    out_s, out_i = pl.pallas_call(
        _make_kernel(bin_top),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, nt * out_w), jnp.float32),
            jax.ShapeDtypeStruct((B, nt * out_w), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * d,
            bytes_accessed=n_pad * d * 4 + B * nt * out_w * 8,
            transcendentals=0,
        ),
    )(
        jnp.asarray(sn, jnp.int32).reshape(1),
        Vp.astype(jnp.float32),
        C.reshape(1, -1),
        T.reshape(1, -1),
        dn.reshape(1, -1),
        oid.reshape(1, -1).astype(jnp.int32),
        qV.astype(jnp.float32),
        active_c.astype(jnp.int32).reshape(B, 1),
        v.astype(jnp.float32).reshape(B, 1),
        active_t.astype(jnp.int32).reshape(B, 1),
        l.astype(jnp.float32).reshape(B, 1),
        r.astype(jnp.float32).reshape(B, 1),
    )
    return out_s, out_i


def deferred_bin_scan_xla(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile=8192, bin_top=2,
    precision=jax.lax.Precision.HIGHEST,
    payload=None,
):
    """XLA fallback with the kernel's algorithm: lax.scan over tiles, each
    step emitting its top-R-per-bin candidates (no carry merge, no big
    score materialization). Same output contract as fused_bin_scan up to
    column order. Measured ~7× faster than the per-tile top-k merge.

    ``oid`` drives the sample-proportion mask (original ids); ``payload``
    (default: oid) is what gets *reported* per candidate — reordered-view
    engines pass view positions here so their refinement gather stays local.
    """
    n_pad, d = Vp.shape
    nt = n_pad // db_tile
    B = qV.shape[0]
    bins = db_tile // BIN
    qVf = qV.astype(jnp.float32)
    if payload is None:
        payload = oid

    xs = (
        Vp.reshape(nt, db_tile, d),
        C.reshape(nt, db_tile),
        T.reshape(nt, db_tile),
        dn.reshape(nt, db_tile),
        oid.reshape(nt, db_tile).astype(jnp.int32),
        payload.reshape(nt, db_tile).astype(jnp.int32),
    )

    # qnorm shift clamps scores non-negative like the packed variants —
    # downstream bitcast orderings (binned_stream_topk) and the exactness
    # certificate require full squared distances, not dn − 2q·V
    qnorm = jnp.sum(qVf * qVf, axis=1)

    def step(_, tile):
        V_t, C_t, T_t, dn_t, oid_t, pay_t = tile
        scores = dn_t[None, :] - 2.0 * jax.lax.dot_general(
            qVf, V_t.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.maximum(scores + qnorm[:, None], 0.0)
        ok = oid_t[None, :] < sn
        ok &= (~active_c[:, None]) | (C_t[None, :] == v[:, None])
        ok &= (~active_t[:, None]) | (
            (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
        )
        scores = jnp.where(ok, scores, jnp.inf)

        s3 = scores.reshape(B, bins, BIN)
        g3 = jnp.broadcast_to(pay_t.reshape(1, bins, BIN), (B, bins, BIN))
        lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
        ms, gs = [], []
        for rnd in range(bin_top):
            a = jnp.argmin(s3, axis=2)
            ms.append(jnp.min(s3, axis=2))
            gs.append(jnp.take_along_axis(g3, a[:, :, None], axis=2)[..., 0])
            if rnd + 1 < bin_top:
                s3 = jnp.where(lane == a[:, :, None], jnp.inf, s3)
        return None, (jnp.concatenate(ms, 1), jnp.concatenate(gs, 1))

    _, (out_s, out_i) = jax.lax.scan(step, None, xs)    # (nt, B, R*bins)
    out_s = jnp.moveaxis(out_s, 0, 1).reshape(B, nt * bin_top * bins)
    out_i = jnp.moveaxis(out_i, 0, 1).reshape(B, nt * bin_top * bins)
    return out_s, out_i


def packed_top2_tournament(packed):
    """(min1, min2) per bin from packed keys via a balanced min/max tree.

    ``packed``: (B, bins, BIN) int32 order-preserving keys. The round-based
    top-2 (min-reduce, broadcast the winner back, mask, min-reduce again)
    costs two full lane-reduces plus a full-width select — the measured
    structural floor of the scan (DESIGN.md §3 "rounds are the floor").
    The tournament carries (best, second) pairs up a binary tree instead:
    4 min/max ops per level on *halving* widths ≈ one full-width pass
    total, and — crucially for XLA — the dataflow is a pure tree with no
    reduce→broadcast→re-reduce dependency, so the whole selection fuses
    into the score tile's consumer fusion instead of forcing the (B, Dt)
    packed tensor to materialize between rounds.

    Keys are distinct by construction (lane id in the low bits), so the
    top-2 multiset equals the two round winners exactly.
    """
    m1 = packed
    m2 = None
    while m1.shape[-1] > 1:
        h = m1.shape[-1] // 2
        a1 = m1[..., :h]
        b1 = m1[..., h:]
        lo = jnp.minimum(a1, b1)
        hi = jnp.maximum(a1, b1)
        if m2 is None:
            m1, m2 = lo, hi
        else:
            a2 = m2[..., :h]
            b2 = m2[..., h:]
            m1 = lo
            m2 = jnp.minimum(hi, jnp.minimum(a2, b2))
    return m1[..., 0], m2[..., 0]


def deferred_packed_scan_xla(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile=8192, bin_top=2,
    precision=jax.lax.Precision.HIGHEST,
    qnorm=None,
    unroll=8,
    reduce_impl: str = "auto",
    masked: bool = True,
    layout: str = "lane",
    row0=None,
    ntw: int | None = None,
):
    """Packed-key variant of the deferred bin scan — the fast TPU path.

    Each bin round of :func:`deferred_bin_scan_xla` costs an argmin, a min,
    and a gather. Packing the candidate key as

        int32( bitcast(float32 distance) & ~0x7F  |  lane )

    (order-preserving for non-negative floats; BIN=128 lanes fit the 7
    zeroed mantissa bits) turns each round into ONE min-reduce plus a mask,
    and candidate *positions* come back as pure arithmetic — no gathers at
    all in the hot loop. The 7 dropped mantissa bits perturb selection by
    ≤ 2⁻¹⁶ relative, far below the exact-refinement slack.

    Returns (dist (B, W) float32 [low bits zeroed, +inf = empty],
             pos (B, W) int32 row positions). ``oid`` only drives the
    sample-proportion mask; positions are the payload.

    ``reduce_impl``: "rounds" (min → mask winner → min; the measured
    winner — XLA's native lane-reduce beats the tournament tree 2×),
    "tournament" (:func:`packed_top2_tournament`, bin_top == 2 only;
    kept as a tested negative result), or "auto" (= rounds). ``masked=False`` statically drops the
    predicate/sample mask — the engine uses it for all-type-0 batches at
    sample_proportion == 1, removing ~9 VPU ops per row.

    ``layout``: how tile positions group into 128-row bins.

    * "lane" — bin = contiguous 128 positions, reduce over the minor
      (lane) axis: ``(B, bins, BIN)``, min over axis 2.
    * "axis1" — bin = strided positions {b, b+bins, …}, reduce over the
      second-minor (sublane) axis: ``(B, BIN, bins)``, min over axis 1.
      Measured 25% faster with extra rounds at ~1.2 ms instead of 6.8
      (experiments/scan_anatomy4/5.py): second-minor reduces lower
      without cross-lane shuffles. Bins are arbitrary row groups, so the
      Poisson model and the certificate are layout-independent; only the
      position decode changes (pos = tile·Dt + slice·bins + bin).

    ``row0`` (dynamic, tile-aligned) + ``ntw`` (static): scan only the
    ``ntw``-tile WINDOW starting at row ``row0`` — each step dynamic-slices
    one tile from the flat arrays (no stacked/window copy, so HBM peak
    stays at the resident view). Positions come back GLOBAL. The
    partitioned engine's wide-type-2 middle path uses this on the T-sorted
    view where a start-sorted batch's candidates provably live in the
    window.
    """
    n_pad, d = Vp.shape
    nt = n_pad // db_tile
    B = qV.shape[0]
    bins = db_tile // BIN
    # match the database dtype: bf16 storage → bf16 matmul inputs (fp32
    # accumulate via preferred_element_type), halving HBM bytes per pass
    qVf = qV.astype(Vp.dtype)
    qf32 = qV.astype(jnp.float32)
    if qnorm is None:
        qnorm = jnp.sum(qf32 * qf32, axis=1)        # (B,) makes dists ≥ 0

    if layout == "axis1":
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BIN, bins), 1)
        red_axis = 1
    else:
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bins, BIN), 2)
        red_axis = 2
    INF_PACK = jnp.int32(0x7F800000)                # +inf, lane 0

    tournament = reduce_impl == "tournament" and layout == "lane"

    def step_body(tile):
        V_t, C_t, T_t, dn_t, oid_t = tile
        scores = dn_t[None, :] - 2.0 * jax.lax.dot_general(
            qVf, V_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        dist = jnp.maximum(scores + qnorm[:, None], 0.0)
        if masked:
            ok = oid_t[None, :] < sn
            ok &= (~active_c[:, None]) | (C_t[None, :] == v[:, None])
            ok &= (~active_t[:, None]) | (
                (T_t[None, :] >= l[:, None]) & (T_t[None, :] <= r[:, None])
            )
            dist = jnp.where(ok, dist, jnp.inf)

        if layout == "axis1":
            d3 = dist.reshape(B, BIN, bins)
        else:
            d3 = dist.reshape(B, bins, BIN)
        packed = (
            jax.lax.bitcast_convert_type(d3, jnp.int32) & jnp.int32(~0x7F)
        ) | lane_iota
        if tournament:
            m1, m2 = packed_top2_tournament(packed)
            return jnp.stack([m1, m2], axis=1)        # (B, 2, bins)
        outs = []
        for rnd in range(bin_top):
            m = jnp.min(packed, axis=red_axis)       # (B, bins) packed key
            outs.append(m)
            if rnd + 1 < bin_top:
                sel = (
                    (m & jnp.int32(0x7F))[:, None, :]
                    if layout == "axis1"
                    else (m & jnp.int32(0x7F))[:, :, None]
                )
                packed = jnp.where(lane_iota == sel, INF_PACK, packed)
        return jnp.stack(outs, axis=1)               # (B, R, bins)

    # unroll: several tiles per loop iteration amortizes per-step scan
    # overhead (~70 µs/step measured), the dominant cost at 10^7 rows
    if row0 is None:
        xs = (
            Vp.reshape(nt, db_tile, d),
            C.reshape(nt, db_tile),
            T.reshape(nt, db_tile),
            dn.reshape(nt, db_tile),
            oid.reshape(nt, db_tile).astype(jnp.int32),
        )
        nt_scan = nt
        _, packed_out = jax.lax.scan(
            lambda _, tile: (None, step_body(tile)),
            None, xs, unroll=min(unroll, nt),
        )                                             # (nt, B, R, bins)
    else:
        nt_scan = ntw if ntw is not None else nt

        def step_idx(_, i):
            off = row0 + i * db_tile
            tile = (
                jax.lax.dynamic_slice(Vp, (off, 0), (db_tile, d)),
                jax.lax.dynamic_slice(C, (off,), (db_tile,)),
                jax.lax.dynamic_slice(T, (off,), (db_tile,)),
                jax.lax.dynamic_slice(dn, (off,), (db_tile,)),
                jax.lax.dynamic_slice(oid, (off,), (db_tile,)).astype(
                    jnp.int32
                ),
            )
            return None, step_body(tile)

        _, packed_out = jax.lax.scan(
            step_idx, None, jnp.arange(nt_scan),
            unroll=min(unroll, nt_scan),
        )                                             # (ntw, B, R, bins)
    W = nt_scan * bin_top * bins
    packed_flat = jnp.moveaxis(packed_out, 0, 1).reshape(B, W)

    # unpack: distance = key & ~0x7F; position from the 7 payload bits —
    # lane layout: pos = tile·Dt + bin·BIN + lane;
    # axis1 layout: pos = tile·Dt + slice·bins + bin (strided groups)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    tile_idx = col // (bin_top * bins)
    bin_idx = col % bins
    payload = packed_flat & jnp.int32(0x7F)
    if layout == "axis1":
        pos = tile_idx * db_tile + payload * bins + bin_idx
    else:
        pos = tile_idx * db_tile + bin_idx * BIN + payload
    if row0 is not None:
        pos = pos + row0            # window scan: GLOBAL view positions
    dist = jax.lax.bitcast_convert_type(
        packed_flat & jnp.int32(~0x7F), jnp.float32
    )
    return dist, pos


def last_round_dists(out_s, nt: int, bin_top: int, bins: int):
    """Per-bin worst-kept distances from a deferred/fused scan's output.

    All three scan variants lay out each tile's candidates round-major
    ((B, nt·R·bins) with rounds contiguous inside a tile), so the final
    round's columns are each bin's R-th (worst) extracted value — the
    exactness certificate's per-bin saturation level. +inf where a bin had
    fewer than R unmasked rows (never a false suspect)."""
    B = out_s.shape[0]
    return out_s.reshape(B, nt, bin_top, bins)[:, :, -1, :].reshape(B, -1)


def v3_query_block(B: int, cap: int) -> int:
    """Largest divisor of ``B`` that is ≤ ``cap``.

    The v3 kernel's query sub-block must tile the batch exactly
    (``B % b_block == 0``); ``min(cap, B)`` only guarantees that for
    power-of-two batches — a user-set query_batch like 384 would raise at
    the first search (ADVICE r3). Worst case this walks O(B) candidates,
    and B is at most a few thousand."""
    bb = min(cap, B)
    while B % bb:
        bb -= 1
    return bb


def kernel_bin_top(
    db_tile: int, n_pad: int, kprime: int = 128, certified: bool = False
) -> int | None:
    """bin_top for the fused packed kernel: at least the Poisson-sound R
    (choose_bin_top), rounded up so the per-tile output width
    ``R * db_tile/BIN`` is a multiple of 128 (Mosaic requires output block
    last dims divisible by 128)."""
    R0 = choose_bin_top(n_pad, kprime, certified=certified)
    if R0 is None:
        return None
    bins = db_tile // BIN
    R = R0
    while (R * bins) % 128:
        R += 1
    return R


def _make_packed_kernel(bin_top: int, precision=jax.lax.Precision.HIGH):
    # Mosaic's dot lowering supports DEFAULT and HIGHEST only; HIGH (3-pass
    # bf16) maps up to HIGHEST — the matmul is a small share of kernel time.
    if precision == jax.lax.Precision.HIGH:
        precision = jax.lax.Precision.HIGHEST

    def _kernel(
        sn_ref,                       # SMEM scalar-prefetch: scan limit
        V_ref,                        # (Dt, 128) database tile
        C_ref, T_ref, dn_ref,         # (1, Dt) attribute / norm rows
        oid_ref,                      # (1, Dt) int32 original ids (sn mask)
        qV_ref,                       # (B, 128) query block (replicated)
        qn_ref,                       # (B, 1) query squared norms
        ac_ref, v_ref, at_ref, l_ref, r_ref,  # (B, 1) predicate fields
        out_ref,                      # (B, bin_top * Dt/BIN) int32 packed keys
    ):
        Dt = V_ref.shape[0]
        B = qV_ref.shape[0]
        bins = Dt // BIN

        # MXU: dist = ‖q‖² + ‖d‖² − 2·q·d  (selection-grade precision; the
        # exact fp32 refinement outside restores the distance contract)
        qd = jax.lax.dot_general(
            qV_ref[:], V_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        dist = jnp.maximum(
            dn_ref[0, :][None, :] - 2.0 * qd + qn_ref[:], 0.0
        )

        # VPU: fused predicate mask (reference optimized.hpp:84-117)
        ok = oid_ref[0, :][None, :] < sn_ref[0]
        ok &= jnp.logical_or(ac_ref[:] == 0, C_ref[0, :][None, :] == v_ref[:])
        ok &= jnp.logical_or(
            at_ref[:] == 0,
            jnp.logical_and(T_ref[0, :][None, :] >= l_ref[:],
                            T_ref[0, :][None, :] <= r_ref[:]),
        )
        dist = jnp.where(ok, dist, jnp.inf)

        # VPU: packed keys — bitcast(dist) & ~0x7F | lane. Order-preserving
        # for non-negative floats; each bin round is ONE min-reduce.
        d3 = dist.reshape(B, bins, BIN)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, bins, BIN), 2)
        packed = (
            pltpu.bitcast(d3, jnp.int32) & jnp.int32(~0x7F)
        ) | lane_iota
        for rnd in range(bin_top):
            m = jnp.min(packed, axis=2)              # (B, bins)
            out_ref[:, rnd * bins : (rnd + 1) * bins] = m
            if rnd + 1 < bin_top:
                packed = jnp.where(
                    lane_iota == (m & jnp.int32(0x7F))[:, :, None],
                    jnp.int32(0x7F800000), packed,
                )

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("db_tile", "bin_top", "interpret", "precision"),
)
def fused_packed_scan(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile: int = 8192,
    bin_top: int = 2,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
):
    """Fused Pallas kernel with packed distance+lane keys — the intended
    TPU default. Same output contract as :func:`deferred_packed_scan_xla`:
    (dist (B, W) float32 [low mantissa bits zeroed, +inf = empty],
    pos (B, W) int32 row positions), W = nt · bin_top · db_tile/128.

    One HBM read of the database per query batch; the (B, Dt) score tile,
    mask, and bin reduces all live in VMEM. ``bin_top * db_tile/128`` must
    be a multiple of 128 (use :func:`kernel_bin_top`).
    """
    n_pad, d = Vp.shape
    if n_pad % db_tile:
        raise ValueError(f"n_pad {n_pad} not divisible by db_tile {db_tile}")
    if db_tile % BIN:
        raise ValueError(f"db_tile {db_tile} not divisible by bin {BIN}")
    nt = n_pad // db_tile
    B = qV.shape[0]
    bins = db_tile // BIN
    out_w = bin_top * bins
    if out_w % 128:
        raise ValueError(
            f"bin_top*bins = {out_w} must be a multiple of 128 "
            "(Mosaic output block constraint); see kernel_bin_top"
        )
    # Fail fast on configs that cannot fit v5e's 128 MB VMEM: the score
    # tile, packed keys, and the double-buffered database tile coexist.
    # (B=1024, Dt=16384 measured: Mosaic AOT ran 35 min then failed with
    # "Used 145.15M of 128.00M vmem".)
    vmem_est = (
        2 * B * db_tile * 4          # fp32 scores + packed int32 keys
        + 2 * db_tile * (d * 4 + 16)  # double-buffered V tile + C/T/dn/oid
        + B * out_w * 4               # output block
    )
    if not interpret and vmem_est > 120 * 1024 * 1024:
        raise ValueError(
            f"fused_packed_scan config B={B}, db_tile={db_tile} needs "
            f"~{vmem_est >> 20} MB VMEM (> 120 MB budget); reduce "
            "db_tile or the query batch"
        )

    col = lambda i, *_: (0, i)           # queries replicated across grid steps
    row = lambda i, *_: (i, 0)           # database tiles marching down rows
    rep = lambda i, *_: (0, 0)

    qf32 = qV.astype(jnp.float32)
    qnorm = jnp.sum(qf32 * qf32, axis=1, keepdims=True)   # (B, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((db_tile, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, d), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, out_w), col, memory_space=pltpu.VMEM),
        ],
    )

    (packed_out,) = pl.pallas_call(
        _make_packed_kernel(bin_top, precision),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, nt * out_w), jnp.int32)],
        interpret=interpret,
        # The (B, Dt) score tile + packed keys + iota live in VMEM at once:
        # ~29 MB at B=256, Dt=8192 — above the 16 MB default scoped limit
        # but comfortably inside v5e's 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * d,
            bytes_accessed=n_pad * d * 4 + B * nt * out_w * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(sn, jnp.int32).reshape(1),
        Vp.astype(jnp.float32),
        C.reshape(1, -1),
        T.reshape(1, -1),
        dn.reshape(1, -1),
        oid.reshape(1, -1).astype(jnp.int32),
        qf32,
        qnorm,
        active_c.astype(jnp.int32).reshape(B, 1),
        v.astype(jnp.float32).reshape(B, 1),
        active_t.astype(jnp.int32).reshape(B, 1),
        l.astype(jnp.float32).reshape(B, 1),
        r.astype(jnp.float32).reshape(B, 1),
    )

    # unpack: position = tile*Dt + bin*BIN + lane (identical decomposition
    # to deferred_packed_scan_xla — round-major layout inside each tile)
    W = nt * out_w
    colw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    tile_idx = colw // out_w
    bin_idx = colw % bins
    lane = packed_out & jnp.int32(0x7F)
    pos = tile_idx * db_tile + bin_idx * BIN + lane
    dist = jax.lax.bitcast_convert_type(
        packed_out & jnp.int32(~0x7F), jnp.float32
    )
    return dist, pos


def _make_packed_kernel_v2(bin_top: int):
    def _kernel(
        sn_ref,                       # SMEM scalar-prefetch: scan limit
        V_ref,                        # (Dt, 128) fp32 database tile
        C_ref, T_ref, dn_ref,         # (1, Dt) attribute / norm rows
        oid_ref,                      # (1, Dt) int32 original ids (sn mask)
        qhi_ref, qlo_ref,             # (Bb, 128) bf16 query planes
        qn_ref,                       # (Bb, 1) query squared norms fp32
        ac_ref, v_ref, at_ref, l_ref, r_ref,  # (Bb, 1) predicate fields
        out_ref,                      # (Bb, bin_top * Dt/BIN) int32 keys
    ):
        Dt = V_ref.shape[0]
        B = qhi_ref.shape[0]
        bins = Dt // BIN

        # Manual 3-pass bf16 matmul (the XLA Precision.HIGH algorithm —
        # Mosaic's dot supports only DEFAULT/HIGHEST, and HIGHEST is the
        # 6-pass fp32 emulation that made kernel v1 lose; see DESIGN §3).
        # V splits into bf16 planes in VMEM (hi + lo captures 16 mantissa
        # bits); the dropped lo·lo term is ≲2⁻³² relative. Total error
        # ≈ 2⁻²¹·‖q‖‖d‖ — inside the certificate's slack model.
        V = V_ref[:]
        Vhi = V.astype(jnp.bfloat16)
        Vlo = (V - Vhi.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        qd = mm(qhi_ref[:], Vhi) + mm(qhi_ref[:], Vlo) + mm(qlo_ref[:], Vhi)
        dist = jnp.maximum(
            dn_ref[0, :][None, :] - 2.0 * qd + qn_ref[:], 0.0
        )

        # VPU: fused predicate mask (reference optimized.hpp:84-117)
        ok = oid_ref[0, :][None, :] < sn_ref[0]
        ok &= jnp.logical_or(ac_ref[:] == 0, C_ref[0, :][None, :] == v_ref[:])
        ok &= jnp.logical_or(
            at_ref[:] == 0,
            jnp.logical_and(T_ref[0, :][None, :] >= l_ref[:],
                            T_ref[0, :][None, :] <= r_ref[:]),
        )
        dist = jnp.where(ok, dist, jnp.inf)

        # packed keys — bitcast(dist) & ~0x7F | lane; each bin round is one
        # min-reduce over VMEM-resident data.
        d3 = dist.reshape(B, bins, BIN)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, bins, BIN), 2)
        packed = (
            pltpu.bitcast(d3, jnp.int32) & jnp.int32(~0x7F)
        ) | lane_iota
        for rnd in range(bin_top):
            m = jnp.min(packed, axis=2)              # (Bb, bins)
            out_ref[:, rnd * bins : (rnd + 1) * bins] = m
            if rnd + 1 < bin_top:
                packed = jnp.where(
                    lane_iota == (m & jnp.int32(0x7F))[:, :, None],
                    jnp.int32(0x7F800000), packed,
                )

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("db_tile", "bin_top", "b_block", "interpret"),
)
def fused_packed_scan_v2(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile: int = 8192,
    bin_top: int = 2,
    b_block: int = 256,
    interpret: bool = False,
):
    """Kernel v1 retuned (VERDICT r1 weak #6): selection-grade 3-pass bf16
    matmul expressed manually (Mosaic has no Precision.HIGH) and a
    B-subtiled grid so the (Bb, Dt) score tile + keys stay ~16 MB of VMEM
    at any query-batch size. Grid order (tile, b) keeps each database tile
    resident across the b steps — HBM still reads the database once.

    Same output contract as :func:`deferred_packed_scan_xla`.
    """
    n_pad, d = Vp.shape
    if n_pad % db_tile:
        raise ValueError(f"n_pad {n_pad} not divisible by db_tile {db_tile}")
    if db_tile % BIN:
        raise ValueError(f"db_tile {db_tile} not divisible by bin {BIN}")
    B = qV.shape[0]
    b_block = min(b_block, B)
    if B % b_block:
        raise ValueError(f"B {B} not divisible by b_block {b_block}")
    nt = n_pad // db_tile
    nb = B // b_block
    bins = db_tile // BIN
    out_w = bin_top * bins
    if out_w % 128:
        raise ValueError(
            f"bin_top*bins = {out_w} must be a multiple of 128 "
            "(Mosaic output block constraint); see kernel_bin_top"
        )

    qf32 = qV.astype(jnp.float32)
    qhi = qf32.astype(jnp.bfloat16)
    qlo = (qf32 - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    qnorm = jnp.sum(qf32 * qf32, axis=1, keepdims=True)   # (B, 1)

    tile_row = lambda i, b, *_: (i, 0)   # DB tile: marches over i, b-invariant
    tile_col = lambda i, b, *_: (0, i)
    qrow = lambda i, b, *_: (b, 0)       # query blocks: march over b
    out_ix = lambda i, b, *_: (b, i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nb),
        in_specs=[
            pl.BlockSpec((db_tile, d), tile_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_block, out_w), out_ix, memory_space=pltpu.VMEM),
        ],
    )

    (packed_out,) = pl.pallas_call(
        _make_packed_kernel_v2(bin_top),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, nt * out_w), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_pad * d,
            bytes_accessed=n_pad * d * 4 + B * nt * out_w * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(sn, jnp.int32).reshape(1),
        Vp.astype(jnp.float32),
        C.reshape(1, -1),
        T.reshape(1, -1),
        dn.reshape(1, -1),
        oid.reshape(1, -1).astype(jnp.int32),
        qhi,
        qlo,
        qnorm,
        active_c.astype(jnp.int32).reshape(B, 1),
        v.astype(jnp.float32).reshape(B, 1),
        active_t.astype(jnp.int32).reshape(B, 1),
        l.astype(jnp.float32).reshape(B, 1),
        r.astype(jnp.float32).reshape(B, 1),
    )

    # unpack: position = tile*Dt + bin*BIN + lane (identical decomposition
    # to deferred_packed_scan_xla — round-major layout inside each tile)
    W = nt * out_w
    colw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    tile_idx = colw // out_w
    bin_idx = colw % bins
    lane = packed_out & jnp.int32(0x7F)
    pos = tile_idx * db_tile + bin_idx * BIN + lane
    dist = jax.lax.bitcast_convert_type(
        packed_out & jnp.int32(~0x7F), jnp.float32
    )
    return dist, pos


def _make_packed_kernel_v3(bin_top: int, bf16_plane: bool):
    """v3: the epilogue reduces over the SUBLANE axis (the axis1 layout
    that measured 25% faster in XLA, experiments/scan_anatomy4/5.py) and
    the matmul is a single true-bf16 pass when fed the bf16 scan plane.

    v2's loss to XLA (54.8 vs 26.6 ms/batch) traced to the lane-axis
    min rounds: cross-lane reduces shuffle through the VPU, while
    sublane-group mins are plain strided vector ops. Here ``dist`` is
    reshaped (Bb, Dt) → (Bb, S=128, bins=Dt/128): the minor (lane) axis is
    the BIN index and the reduce runs over axis 1 — identical semantics to
    ``deferred_packed_scan_xla(layout="axis1")``, payload = the slice
    index s ∈ [0, 128), position = tile·Dt + s·bins + bin.
    """

    def _kernel(
        sn_ref,                       # SMEM scalar-prefetch: scan limit
        V_ref,                        # (Dt, 128) database tile (bf16|fp32)
        C_ref, T_ref, dn_ref,         # (1, Dt) attribute / norm rows
        oid_ref,                      # (1, Dt) int32 original ids (sn mask)
        qhi_ref, qlo_ref,             # (Bb, 128) bf16 query planes
        qn_ref,                       # (Bb, 1) query squared norms fp32
        ac_ref, v_ref, at_ref, l_ref, r_ref,  # (Bb, 1) predicate fields
        out_ref,                      # (Bb, bin_top * Dt/BIN) int32 keys
    ):
        Dt = V_ref.shape[0]
        B = qhi_ref.shape[0]
        bins = Dt // BIN              # lane count of the reshaped epilogue

        def mm(a, b):
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if bf16_plane:
            # the scan plane is already rounded bf16: ONE MXU pass; the
            # widened _CERT_REL_MM_BF16 slack covers the rounding
            qd = mm(qhi_ref[:], V_ref[:])
        else:
            # fp32 storage: manual 3-pass bf16 (the Precision.HIGH
            # algorithm; error ≈ 2⁻²¹ inside the fp32 slack model)
            V = V_ref[:]
            Vhi = V.astype(jnp.bfloat16)
            Vlo = (V - Vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            qd = (
                mm(qhi_ref[:], Vhi)
                + mm(qhi_ref[:], Vlo)
                + mm(qlo_ref[:], Vhi)
            )
        dist = jnp.maximum(dn_ref[0, :][None, :] - 2.0 * qd + qn_ref[:], 0.0)

        # VPU: fused predicate mask (reference optimized.hpp:84-117)
        ok = oid_ref[0, :][None, :] < sn_ref[0]
        ok &= jnp.logical_or(ac_ref[:] == 0, C_ref[0, :][None, :] == v_ref[:])
        ok &= jnp.logical_or(
            at_ref[:] == 0,
            jnp.logical_and(T_ref[0, :][None, :] >= l_ref[:],
                            T_ref[0, :][None, :] <= r_ref[:]),
        )
        dist = jnp.where(ok, dist, jnp.inf)

        # packed keys over the axis1 layout: bins on lanes, slices on
        # sublanes — each round is one SUBLANE-group min, no cross-lane
        # shuffles (the v2 postmortem's fix).
        d3 = dist.reshape(B, BIN, bins)
        slice_iota = jax.lax.broadcasted_iota(jnp.int32, (B, BIN, bins), 1)
        packed = (
            pltpu.bitcast(d3, jnp.int32) & jnp.int32(~0x7F)
        ) | slice_iota
        for rnd in range(bin_top):
            m = jnp.min(packed, axis=1)              # (Bb, bins)
            out_ref[:, rnd * bins : (rnd + 1) * bins] = m
            if rnd + 1 < bin_top:
                packed = jnp.where(
                    slice_iota == (m & jnp.int32(0x7F))[:, None, :],
                    jnp.int32(0x7F800000), packed,
                )

    return _kernel


@functools.partial(
    jax.jit,
    static_argnames=("db_tile", "bin_top", "b_block", "interpret", "ntw"),
)
def fused_packed_scan_v3(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile: int = 16384,
    bin_top: int = 2,
    b_block: int = 256,
    interpret: bool = False,
    row0=None,
    ntw: int | None = None,
):
    """v3 fused kernel: sublane-axis bin rounds + optional bf16 scan plane.

    Same output contract as ``deferred_packed_scan_xla(layout="axis1")``:
    (dist (B, W) float32 [low bits zeroed, +inf = empty], pos (B, W) int32
    row positions), W = nt · bin_top · db_tile/128. Pass a bf16 ``Vp``
    (DeviceDB.V_scan) for the single-pass matmul; fp32 inputs run the
    manual 3-pass bf16 decomposition like v2.

    ``row0`` (dynamic, tile-aligned) + ``ntw`` (static): scan only the
    ``ntw``-tile window starting at row ``row0`` — the window offset rides
    the scalar-prefetch array and the BLOCK INDEX MAPS add it, so the same
    kernel serves the partitioned engine's wide-type-2 window path with no
    copy and no XLA fallback (VERDICT r3 #3). Positions come back GLOBAL.

    Requires ``db_tile`` ≥ 16384 (the reshaped epilogue wants ≥128 lanes)
    and db_tile % 128 == 0.
    """
    n_pad, d = Vp.shape
    if n_pad % db_tile:
        raise ValueError(f"n_pad {n_pad} not divisible by db_tile {db_tile}")
    if db_tile % BIN:
        raise ValueError(f"db_tile {db_tile} not divisible by bin {BIN}")
    bins = db_tile // BIN
    if bins % 128 and not interpret:
        raise ValueError(
            f"v3 kernel wants db_tile/128 = {bins} lanes ≥ a full vreg; "
            "use db_tile >= 16384"
        )
    B = qV.shape[0]
    b_block = min(b_block, B)
    if B % b_block:
        raise ValueError(f"B {B} not divisible by b_block {b_block}")
    nt = n_pad // db_tile if row0 is None else ntw
    nb = B // b_block
    out_w = bin_top * bins

    bf16_plane = Vp.dtype == jnp.bfloat16
    qf32 = qV.astype(jnp.float32)
    qhi = qf32.astype(jnp.bfloat16)
    qlo = (qf32 - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    qnorm = jnp.sum(qf32 * qf32, axis=1, keepdims=True)   # (B, 1)

    vbytes = 2 if bf16_plane else 4
    vmem_est = (
        2 * b_block * db_tile * 4      # fp32 dist + packed int32 keys
        + 2 * db_tile * (d * vbytes + 16)
        + b_block * out_w * 4
    )
    if not interpret and vmem_est > 120 * 1024 * 1024:
        raise ValueError(
            f"fused_packed_scan_v3 b_block={b_block}, db_tile={db_tile} "
            f"needs ~{vmem_est >> 20} MB VMEM; reduce b_block or db_tile"
        )

    # Scalar-prefetch array [sn, t0]: the window's tile offset feeds the
    # BLOCK INDEX MAPS (grid step i fetches database tile t0+i), so a
    # dynamic window costs nothing when t0 == 0.
    tile_row = lambda i, b, s: (s[1] + i, 0)   # DB tile: marches over i
    tile_col = lambda i, b, s: (0, s[1] + i)
    qrow = lambda i, b, s: (b, 0)              # query blocks: march over b
    out_ix = lambda i, b, s: (b, i)            # outputs stay window-local

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nb),
        in_specs=[
            pl.BlockSpec((db_tile, d), tile_row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, db_tile), tile_col, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, d), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, 1), qrow, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_block, out_w), out_ix, memory_space=pltpu.VMEM),
        ],
    )

    t0 = (
        jnp.zeros((), jnp.int32)
        if row0 is None
        else (jnp.asarray(row0, jnp.int32) // db_tile)
    )
    (packed_out,) = pl.pallas_call(
        _make_packed_kernel_v3(bin_top, bf16_plane),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, nt * out_w), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nt * db_tile * d,
            bytes_accessed=nt * db_tile * d * vbytes + B * nt * out_w * 4,
            transcendentals=0,
        ),
    )(
        jnp.stack([jnp.asarray(sn, jnp.int32), t0]),
        Vp,
        C.reshape(1, -1),
        T.reshape(1, -1),
        dn.reshape(1, -1),
        oid.reshape(1, -1).astype(jnp.int32),
        qhi,
        qlo,
        qnorm,
        active_c.astype(jnp.int32).reshape(B, 1),
        v.astype(jnp.float32).reshape(B, 1),
        active_t.astype(jnp.int32).reshape(B, 1),
        l.astype(jnp.float32).reshape(B, 1),
        r.astype(jnp.float32).reshape(B, 1),
    )

    # unpack with the axis1 decode: pos = tile·Dt + slice·bins + bin
    W = nt * out_w
    colw = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    tile_idx = colw // out_w
    bin_idx = colw % bins
    payload = packed_out & jnp.int32(0x7F)
    pos = tile_idx * db_tile + payload * bins + bin_idx
    if row0 is not None:
        pos = pos + row0            # window scan: GLOBAL view positions
    dist = jax.lax.bitcast_convert_type(
        packed_out & jnp.int32(~0x7F), jnp.float32
    )
    return dist, pos


def fused_bin_scan_reference(
    Vp, C, T, dn, oid, qV, active_c, v, active_t, l, r, sn,
    db_tile=2048, bin_top=2,
):
    """Pure-jnp mirror of the kernel (differential test + CPU fallback)."""
    n_pad, d = Vp.shape
    nt = n_pad // db_tile
    B = qV.shape[0]
    bins = db_tile // BIN

    scores = dn[None, :] - 2.0 * jax.lax.dot_general(
        qV.astype(jnp.float32), Vp.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    ok = (oid[None, :] < sn)
    ok &= (~active_c[:, None]) | (C[None, :] == v[:, None])
    ok &= (~active_t[:, None]) | ((T[None, :] >= l[:, None]) & (T[None, :] <= r[:, None]))
    scores = jnp.where(ok, scores, jnp.inf)

    s3 = scores.reshape(B, nt, bins, BIN)
    g3 = jnp.broadcast_to(oid.reshape(1, nt, bins, BIN), (B, nt, bins, BIN))
    lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 3)
    ms, is_ = [], []
    for rnd in range(bin_top):
        a = jnp.argmin(s3, axis=3)
        ms.append(jnp.min(s3, axis=3))
        is_.append(jnp.take_along_axis(g3, a[..., None], axis=3)[..., 0])
        if rnd + 1 < bin_top:
            s3 = jnp.where(lane == a[..., None], jnp.inf, s3)
    out_s = jnp.concatenate(ms, axis=2).reshape(B, nt * bin_top * bins)
    out_i = jnp.concatenate(is_, axis=2).reshape(B, nt * bin_top * bins)
    return out_s, out_i
