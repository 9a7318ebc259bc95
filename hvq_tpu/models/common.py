"""Shared engine machinery: the streaming scan step and exact finalization.

This is the functional core every optimized engine composes:

  scan over D tiles:   scores = ‖d‖² − 2·Q·Dᵀ  (MXU)  + predicate mask
                       carry  = top-k'(carry ∪ tile)          [ops.topk]
  finalize:            exact fp32 re-refinement of the k' survivors,
                       reference-exact pad-to-k, sort ascending by distance

The finalize stage reproduces the reference's tail-padding semantics
(optimized.hpp:120-128): when fewer than k candidates pass the predicate, the
missing slots are filled with ids ``n-1, n-2, ...`` from the *full* dataset —
predicate ignored, duplicates allowed — and everything is ordered by true
distance (optimized_impl.h:392-437 ``get_knn_sorted``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops import topk as topk_ops
from hvq_tpu.ops.distance import exact_distances, tile_scores


class QueryBatch(NamedTuple):
    """Device-ready decoded query batch (B queries)."""

    qV: jnp.ndarray        # (B, 128) fp32, zero-padded query vectors
    active_c: jnp.ndarray  # (B,) bool
    v: jnp.ndarray         # (B,) fp32
    active_t: jnp.ndarray  # (B,) bool
    l: jnp.ndarray         # (B,) fp32
    r: jnp.ndarray         # (B,) fp32


def scan_database(
    tiles: tuple,            # (Vt (nt,Dt,128), Ct, Tt, dnt) reshaped views
    qb: QueryBatch,
    sn: jnp.ndarray,         # traced scalar: scan limit (sample proportion)
    kprime: int,
    db_tile: int,
    id_offset: jnp.ndarray | int = 0,   # global-id offset (sharded engines)
    precision=jax.lax.Precision.HIGHEST,
    strategy: str = "topk",
    compute_dtype=jnp.float32,
    oid_tiles: jnp.ndarray | None = None,  # (nt, Dt) original ids (reordered views)
    tile_index: jnp.ndarray | None = None,  # (nt,) which tiles to scan (pruned)
):
    """Run the streaming masked-distance top-k' scan over the database tiles.

    Returns (scores (B, k'), ids (B, k')) with +inf marking empty slots.
    ``id_offset`` turns tile-local row positions into global ids so sharded
    callers can merge across devices (the ``Knn::merge`` id space).

    Index-layer hooks: when the database is a *reordered view* (partitioned /
    IVF layouts), ``oid_tiles`` carries each row's original id — the
    sample-proportion limit tests the ORIGINAL id (the reference's ``j < sn``
    is over file order, optimized.hpp:85), while the returned ids are VIEW
    POSITIONS so the caller's refinement gather stays local (map back to
    original ids via ``finalize_view``). ``tile_index`` scans only the
    listed tiles (tile pruning): entries < 0 are skipped via a mask of the
    whole tile.
    """
    Vt, Ct, Tt, dnt = tiles
    B = qb.qV.shape[0]
    qV = qb.qV.astype(compute_dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (db_tile,), 0)

    init = (
        jnp.full((B, kprime), jnp.inf, jnp.float32),
        jnp.zeros((B, kprime), jnp.int32),
    )

    def body(carry, V_tile, C_tile, T_tile, dn_tile, base, oid_tile, live):
        pos = base + lane + id_offset                 # row position in view
        row_id = pos if oid_tile is None else oid_tile
        scores = tile_scores(qV, V_tile.astype(compute_dtype), dn_tile, precision)
        ok = mask_ops.block_mask(
            C_tile, T_tile, row_id, sn,
            qb.active_c, qb.v, qb.active_t, qb.l, qb.r,
        )
        if live is not None:
            ok = ok & live
        scores = jnp.where(ok, scores, jnp.inf)
        ids = jnp.broadcast_to(pos[None, :], (B, db_tile)).astype(jnp.int32)
        return topk_ops.merge_topk(
            carry[0], carry[1], scores, ids, kprime, strategy
        )

    if tile_index is None:
        bases = jnp.arange(Vt.shape[0], dtype=jnp.int32) * db_tile
        xs = (Vt, Ct, Tt, dnt, bases, oid_tiles)

        def step(carry, xs):
            V_tile, C_tile, T_tile, dn_tile, base, oid_tile = xs
            return body(carry, V_tile, C_tile, T_tile, dn_tile, base,
                        oid_tile, None), None

        (scores, ids), _ = jax.lax.scan(step, init, xs)
    else:
        # Pruned scan: dynamically gather each listed tile. Negative indices
        # mark padding slots — their whole tile is masked out.
        ti = jnp.asarray(tile_index, jnp.int32)

        def step(carry, t):
            safe = jnp.maximum(t, 0)
            V_tile = jax.lax.dynamic_index_in_dim(Vt, safe, keepdims=False)
            C_tile = jax.lax.dynamic_index_in_dim(Ct, safe, keepdims=False)
            T_tile = jax.lax.dynamic_index_in_dim(Tt, safe, keepdims=False)
            dn_tile = jax.lax.dynamic_index_in_dim(dnt, safe, keepdims=False)
            oid_tile = (
                None if oid_tiles is None
                else jax.lax.dynamic_index_in_dim(oid_tiles, safe, keepdims=False)
            )
            live = jnp.broadcast_to((t >= 0)[None, None], (B, db_tile))
            base = safe * db_tile
            return body(carry, V_tile, C_tile, T_tile, dn_tile, base,
                        oid_tile, live), None

        (scores, ids), _ = jax.lax.scan(step, init, ti)
    return scores, ids


def finalize(
    cand_scores: jnp.ndarray,  # (B, k') matmul-expansion scores, +inf = empty
    cand_ids: jnp.ndarray,     # (B, k') global ids
    Vp: jnp.ndarray,           # (n_pad, 128) the (full, unsharded) vectors
    qb: QueryBatch,
    n: jnp.ndarray,            # traced scalar: true dataset size
    k: int,
    tail_V: jnp.ndarray | None = None,  # (t, 128) tail rows (pad pricing)
):
    """Exact refinement + reference-exact padding + final ascending sort.

    Returns (ids (B, k) int32, dists (B, k) fp32) where dists are direct
    fp32 Σ(q−d)² — the same quantity the .dist file recomputes (io.h:38-48).
    When ``tail_V`` is provided, pad slots are priced from it; otherwise a
    second row gather covers them.
    """
    valid = jnp.isfinite(cand_scores)
    rows = jnp.take(Vp, cand_ids, axis=0)              # (B, k', 128)
    exact = exact_distances(qb.qV, rows)
    exact = jnp.where(valid, exact, jnp.inf)

    if tail_V is not None:
        sel = topk_ops.final_topk(exact, cand_ids, k)
        return finalize_with_tail(sel[0], sel[1], tail_V, qb, n, k)

    sel_d, sel_ids = topk_ops.final_topk(exact, cand_ids, k)
    sel_valid = jnp.isfinite(sel_d)
    m = jnp.sum(sel_valid, axis=1, keepdims=True)      # (B, 1) passing count
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    # Tail-pad ids n-1, n-2, ... for the k-m empty slots (optimized.hpp:120-128).
    pad_ids = (n - 1 - (slot - m)).astype(jnp.int32)
    final_ids = jnp.where(sel_valid, sel_ids, pad_ids)

    # Recompute exact distances for the final id set (covers pads) and order
    # everything ascending by true distance, as get_knn_sorted does.
    rows2 = jnp.take(Vp, final_ids, axis=0)
    final_d = exact_distances(qb.qV, rows2)
    order = jnp.argsort(final_d, axis=1)
    return (
        jnp.take_along_axis(final_ids, order, axis=1),
        jnp.take_along_axis(final_d, order, axis=1),
    )


def finalize_with_tail(
    exact_scores: jnp.ndarray,  # (B, k') EXACT distances, ascending, +inf empty
    cand_ids: jnp.ndarray,      # (B, k') global ids
    tail_V: jnp.ndarray,        # (t, 128) replicated tail rows: tail_V[j] = V[n-1-j]
    qb: QueryBatch,
    n: jnp.ndarray,             # traced scalar: true dataset size
    k: int,
):
    """Finalization without any cross-shard gather (sharded engines).

    Same padding semantics as :func:`finalize`, but the input distances are
    already exact (refined per shard before the merge) and pad rows come from
    a small replicated tail block instead of the full vector table — so no
    device ever gathers remote rows.
    """
    sel_d = exact_scores[:, :k]
    sel_ids = cand_ids[:, :k]
    valid = jnp.isfinite(sel_d)
    m = jnp.sum(valid, axis=1, keepdims=True)
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    pad_ids = (n - 1 - (slot - m)).astype(jnp.int32)
    pad_pos = jnp.clip(slot - m, 0, tail_V.shape[0] - 1)
    pad_rows = jnp.take(tail_V, pad_pos, axis=0)       # (B, k, 128)
    pad_d = exact_distances(qb.qV, pad_rows)
    final_ids = jnp.where(valid, sel_ids, pad_ids)
    final_d = jnp.where(valid, sel_d, pad_d)
    order = jnp.argsort(final_d, axis=1)
    return (
        jnp.take_along_axis(final_ids, order, axis=1),
        jnp.take_along_axis(final_d, order, axis=1),
    )


def finalize_view(
    cand_scores: jnp.ndarray,  # (B, k') matmul scores over a reordered view
    cand_pos: jnp.ndarray,     # (B, k') positions WITHIN the view
    V_view: jnp.ndarray,       # (n_pad, 128) the view's vectors
    oid: jnp.ndarray,          # (n_pad,) original ids of view rows
    tail_V: jnp.ndarray,       # (t, 128) original-order tail rows (pads)
    qb: QueryBatch,
    n: jnp.ndarray,
    k: int,
):
    """Finalization for reordered-view engines (partitioned / IVF layouts).

    Refines by gathering *view* rows (local, contiguous-ish), then maps
    positions back to original ids; tail-padding semantics identical to
    :func:`finalize` (reference optimized.hpp:120-128).
    """
    valid = jnp.isfinite(cand_scores)
    rows = jnp.take(V_view, cand_pos, axis=0)
    exact = jnp.where(valid, exact_distances(qb.qV, rows), jnp.inf)

    sel_d, sel_pos = topk_ops.final_topk(exact, cand_pos, k)
    sel_valid = jnp.isfinite(sel_d)
    m = jnp.sum(sel_valid, axis=1, keepdims=True)
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    pad_ids = (n - 1 - (slot - m)).astype(jnp.int32)
    pad_pos = jnp.clip(slot - m, 0, tail_V.shape[0] - 1)
    pad_d = exact_distances(qb.qV, jnp.take(tail_V, pad_pos, axis=0))

    orig = jnp.take(oid, sel_pos, axis=0).astype(jnp.int32)
    final_ids = jnp.where(sel_valid, orig, pad_ids)
    final_d = jnp.where(sel_valid, sel_d, pad_d)
    order = jnp.argsort(final_d, axis=1)
    return (
        jnp.take_along_axis(final_ids, order, axis=1),
        jnp.take_along_axis(final_d, order, axis=1),
    )


def repair_thr_pre(scores, k: int, qV, dn_max, rel_mm, rel_t, abs_):
    """Provisional saturation threshold for the repair gather gate.

    Built from the k-th candidate ESTIMATE plus DOUBLED slack: the k-th
    exact distance can only be smaller than estimate + slack (the slack
    covers matmul accumulation both ways and the packed-key quantization
    via the rel_t term's 8× margin), so thr_pre ≥ the final certificate
    threshold — gating a bin off with sel_v ≥ thr_pre is always sound.
    Returns +inf (repair every selected bin) when the candidate stream is
    narrower than k. ONE definition for all three engines: the soundness
    argument must not fork per engine.
    """
    import jax.numpy as jnp

    qn = jnp.sum(qV.astype(jnp.float32) ** 2, axis=1)
    if k <= scores.shape[1]:
        t_pre = scores[:, k - 1]
        return t_pre + 2.0 * (rel_mm * (qn + dn_max) + rel_t * t_pre + abs_)
    return jnp.full(scores.shape[:1], jnp.inf)


def cert_suspect(t_bin, t_l2, t_kc, debug: bool):
    """Assemble the certificate suspect column from its terms.

    ``debug`` (HVQ_CERT_TERMS forensics): an int32 bitmask (1 = bin /
    post-repair residual, 2 = level-2, 4 = k'-cut) — nonzero still reads
    as suspect on the host. Otherwise a plain bool OR.
    """
    import jax.numpy as jnp

    if debug:
        s = t_bin.astype(jnp.int32)
        if t_l2 is not None:
            s += 2 * t_l2.astype(jnp.int32)
        if t_kc is not None:
            s += 4 * t_kc.astype(jnp.int32)
        return s
    s = t_bin
    if t_l2 is not None:
        s |= t_l2
    if t_kc is not None:
        s |= t_kc
    return s


def bin_repair_candidates(
    out_s: jnp.ndarray,        # (B, W) packed-scan distances (quantized)
    cand_scores: jnp.ndarray,  # (B, k') stream-selected estimates
    cand_pos: jnp.ndarray,     # (B, k') their positions (view/global space)
    nt: int,
    bin_top: int,
    bins: int,
    db_tile: int,
    layout: str,
    C: jnp.ndarray,
    T: jnp.ndarray,
    oid: jnp.ndarray,
    qb: QueryBatch,
    sn: jnp.ndarray,
    rb: int,
    row0=None,
    id_offset=None,
    thr_pre=None,
):
    """In-program repair of the certificate's bin-saturation term.

    The packed bin scan keeps top-R per 128-row bin; on benign Poisson
    layouts ~C(100,2)/nbins of queries have a bin whose R-th kept value
    lands under the exactness threshold (≈6% at D=10⁷/R=2) — each such
    query used to pay a full-view rescan in the rerun ladder (~200 ms at
    10⁷ rows). Instead, ALWAYS exact-refine the ``rb`` most-saturated
    bins' 128 rows as extra candidates inside the same program: selection
    is threshold-free (the rb smallest per-bin R-th values by iterated
    argmin), so the bin certificate term reduces to
    ``remaining_min < thr`` — the (rb+1)-th most-saturated bin still
    under threshold, P ≈ (collision rate)^(rb+1), effectively never.

    Returns (scores', pos', remaining_min) with the repair rows appended
    as refine candidates: masked exactly like the scan step
    (sample-proportion via ``oid < sn`` + category/time predicates,
    ops.pallas_scan.deferred_packed_scan_xla:437-443), and rows already
    present in ``cand_pos`` are dropped so the merged top-k never holds a
    duplicate id. ``last_round_dists`` values carry quantized-DOWN low
    bits, which only over-flags — soundness is one-sided.

    ``row0``: window offset applied BEFORE the attribute gathers (the
    partitioned wide-type-2 window scan passes full flat view arrays and
    global view positions). ``id_offset``: shard offset applied only to
    the RETURNED positions and the dedup compare (the sharded engine
    gathers from shard-local arrays but carries global candidate ids).

    ``thr_pre`` (B,): a PROVISIONAL saturation threshold that provably
    upper-bounds the final certificate threshold (callers build it from
    the k-th candidate ESTIMATE plus doubled fp slack — the k-th exact
    distance can only be smaller). Selected bins at or above it collapse
    their gather positions to row 0. Soundness is unchanged (a gated-off
    bin satisfies sel_v >= thr_pre >= thr_final, exactly the clean
    condition) — but measured CLEAN at D=10⁷ the gate LOSES 10 %
    (7474 vs 8253 QPS): making the gather indices depend on the level-2
    stream output serializes the repair gather behind the top-k tail it
    previously overlapped, outweighing the scattered reads it saves.
    Engines default to ``repair_gate=False``; pass a thr_pre only on
    parts where gather bandwidth, not overlap, is the binding constraint.
    """
    from hvq_tpu.ops.pallas_scan import BIN, last_round_dists

    B = out_s.shape[0]
    lr = last_round_dists(out_s, nt, bin_top, bins)   # (B, nbins)
    nbins = lr.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, nbins), 1)
    work = lr
    sel_b, sel_v = [], []
    for _ in range(rb):
        sel_v.append(jnp.min(work, axis=1))
        bi = jnp.argmin(work, axis=1).astype(jnp.int32)
        sel_b.append(bi)
        work = jnp.where(col == bi[:, None], jnp.inf, work)
    remaining_min = jnp.min(work, axis=1)             # (B,)
    sel_b = jnp.stack(sel_b, axis=1)                  # (B, rb)
    sel_v = jnp.stack(sel_v, axis=1)                  # (B, rb)

    tile = sel_b // bins
    b = sel_b % bins
    s_iota = jnp.arange(BIN, dtype=jnp.int32)[None, None, :]
    if layout == "axis1":
        pos = tile[:, :, None] * db_tile + s_iota * bins + b[:, :, None]
    else:
        pos = tile[:, :, None] * db_tile + b[:, :, None] * BIN + s_iota
    if row0 is not None:
        pos = pos + row0                              # window scans: global
    # all-inf bins (tiny views, nbins < rb) repeat via argmin-of-inf — mask
    # them or their rows would duplicate each other in the merged top-k
    bin_live = jnp.isfinite(sel_v)
    if thr_pre is not None:
        bin_live &= sel_v < thr_pre[:, None]
        pos = jnp.where(bin_live[:, :, None], pos, 0)  # dummy row 0: the
        # gather degenerates to a cache hit for clean queries
    bin_ok = bin_live[:, :, None]
    pos = pos.reshape(B, rb * BIN)
    ok = jnp.broadcast_to(bin_ok, (B, rb, BIN)).reshape(B, rb * BIN)

    og = jnp.take(oid, pos).astype(jnp.int32)
    ok &= og < sn
    ok &= (~qb.active_c[:, None]) | (jnp.take(C, pos) == qb.v[:, None])
    Tg = jnp.take(T, pos)
    ok &= (~qb.active_t[:, None]) | (
        (Tg >= qb.l[:, None]) & (Tg <= qb.r[:, None])
    )
    out_pos = pos if id_offset is None else pos + id_offset
    dup = jnp.any(
        (out_pos[:, :, None] == cand_pos[:, None, :])
        & jnp.isfinite(cand_scores)[:, None, :],
        axis=-1,
    )
    rep = jnp.where(ok & ~dup, 0.0, jnp.inf)          # finite = refine me
    return (
        jnp.concatenate([cand_scores, rep], axis=1),
        jnp.concatenate([cand_pos, out_pos], axis=1),
        remaining_min,
    )


def prefetch_host(arrays) -> None:
    """Start async device→host copies before a blocking ``np.asarray`` loop.

    Through this environment's axon relay a synchronous per-array fetch
    costs ~36 ms/array regardless of size (per-call round-trip latency);
    issuing ``copy_to_host_async`` on every pending result first lets the
    transfers pipeline, and the subsequent blocking reads land at ~7 ms/
    array — a measured 4.7–5.3× on result-bundle shapes
    (experiments/fetch_bench.py). On standard PCIe hosts the call is the
    same pattern ``jax.device_get`` uses internally; it is never wrong.

    ``arrays`` may contain None (skipped) and non-device values
    (ignored): callers pass e.g. ``(ids, dists)`` pairs where dists is
    None on the ids-only path.
    """
    for a in arrays:
        copy = getattr(a, "copy_to_host_async", None)
        if copy is None:
            continue
        try:
            copy()
        except Exception:   # interpret-mode / committed-host arrays
            continue        # per-array best-effort: keep pipelining the rest


def tail_block_np(V: np.ndarray, t: int = 128) -> np.ndarray:
    """Host-side (t, 128) tail block: row j holds V[n-1-j], zero-padded."""
    from hvq_tpu.ops.distance import pad_vectors_np

    t = min(t, V.shape[0])
    return pad_vectors_np(
        np.ascontiguousarray(V[V.shape[0] - t:][::-1]).astype(np.float32),
        _c.PADDED_DIM,
    )


def pad_query_arrays(qs, batch: int):
    """Host-side: pad query arrays to a multiple of the query batch size.

    Padding queries are type-0 zero-vectors; their results are sliced away.
    """
    m = qs.m
    m_pad = -(-m // batch) * batch
    if m_pad == m:
        return qs.V, qs.qtype, qs.v, qs.l, qs.r, m_pad
    extra = m_pad - m
    V = np.concatenate([qs.V, np.zeros((extra, qs.V.shape[1]), np.float32)])
    qtype = np.concatenate([qs.qtype, np.zeros(extra, np.int32)])
    v = np.concatenate([qs.v, np.full(extra, -1.0, np.float32)])
    l = np.concatenate([qs.l, np.full(extra, -1.0, np.float32)])
    r = np.concatenate([qs.r, np.full(extra, -1.0, np.float32)])
    return V, qtype, v, l, r, m_pad
