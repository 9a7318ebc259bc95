"""Streaming top-k primitives — the ``Knn`` structure reborn functionally.

The reference maintains an unsorted 100-slot array with a branchless insert
and SIMD worst-scan (include/optimized_impl.h:179-438 ``Knn``), merging
per-thread instances serially (optimized_impl.h:337-385). The TPU form is a
(B, k') running-result *tensor* carried through a ``lax.scan`` over database
tiles: each step merges the carry with a fresh (B, Dt) score tile via one
top-k over their concatenation. The cross-device analogue of ``Knn::merge``
lives in hvq_tpu.parallel.collectives.

Smaller distance = better throughout; +inf marks empty/masked slots.

Strategies (selected at engine construction, profiled on hardware):
  * "topk"    — ``lax.top_k`` over the concatenation. Exact.
  * "sort"    — full sort, take first k'. Exact; sometimes faster on TPU for
                wide rows since TopK lowers to a sort variant anyway.
  * "binned"  — per-128-lane-bin min+argmin partial reduction (the TPU-KNN
                PartialReduce idea): reduces (B, Dt) to (B, Dt/128) before an
                exact top-k. Loses a neighbor only when two true top-k' ids
                share a bin — recall governed by bin count; used by the
                approximate fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def merge_topk(
    carry_scores: jnp.ndarray,  # (B, k') ascending-ish, +inf = empty
    carry_ids: jnp.ndarray,     # (B, k') int32
    tile_scores: jnp.ndarray,   # (B, Dt)
    tile_ids: jnp.ndarray,      # (B, Dt) int32 (global ids)
    kprime: int,
    strategy: str = "topk",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming-scan step: best k' of carry ∪ tile, per query row."""
    if strategy == "binned":
        tile_scores, tile_ids = bin_reduce_min(tile_scores, tile_ids)
    scores = jnp.concatenate([carry_scores, tile_scores], axis=1)
    ids = jnp.concatenate([carry_ids, tile_ids], axis=1)
    if strategy == "sort":
        order = jnp.argsort(scores, axis=1)
        order = order[:, :kprime]
        return (
            jnp.take_along_axis(scores, order, axis=1),
            jnp.take_along_axis(ids, order, axis=1),
        )
    top_neg, top_idx = jax.lax.top_k(-scores, kprime)
    return -top_neg, jnp.take_along_axis(ids, top_idx, axis=1)


def bin_reduce_min(
    scores: jnp.ndarray,  # (B, Dt), Dt % bin == 0
    ids: jnp.ndarray,     # (B, Dt)
    bin_size: int = 128,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Keep only the best candidate of every ``bin_size`` lane group.

    VPU-only (no sort), shrinking the top-k input by bin_size×. The
    functional analogue of ``lax.approx_max_k``'s PartialReduce stage, but
    fused with our id bookkeeping and usable inside Pallas kernels.
    """
    B, Dt = scores.shape
    if Dt % bin_size:
        raise ValueError(f"tile width {Dt} not divisible by bin {bin_size}")
    s = scores.reshape(B, Dt // bin_size, bin_size)
    i = ids.reshape(B, Dt // bin_size, bin_size)
    arg = jnp.argmin(s, axis=2, keepdims=True)
    return (
        jnp.take_along_axis(s, arg, axis=2)[..., 0],
        jnp.take_along_axis(i, arg, axis=2)[..., 0],
    )


@functools.partial(jax.jit, static_argnames=("k",))
def final_topk(scores: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Exact top-k with ids, ascending by score."""
    top_neg, top_idx = jax.lax.top_k(-scores, k)
    return -top_neg, jnp.take_along_axis(ids, top_idx, axis=1)


def binned_stream_topk(
    out_s: jnp.ndarray,   # (B, W) candidate stream, non-negative, +inf empty
    out_i: jnp.ndarray,   # (B, W) candidate ids/positions
    kp: int,
    rounds: int = 8,
    nt: int | None = None,
    layout: str = "axis1",
):
    """Second-level packed bin reduce before the final candidate top_k.

    ``lax.top_k`` over a wide candidate stream is the engine tail's main
    cost (measured 31 ms/batch marginal at (B=1024, W=23616),
    experiments/topk_tail.py); reducing the stream first to the best
    ``rounds`` per 128-lane bin with the same packed-key min-reduce used in
    the scan cuts that to ~21 ms — bit-identical top-100 values on random
    streams. Dropping a true top-kp candidate needs > ``rounds`` of them in
    one 128-column stretch; the returned per-bin worst-kept minimum feeds
    the exactness certificate exactly like the first level (the stream's
    tile/round-major order makes adjacent columns correlated for clustered
    data, so the certificate — not the Poisson bound alone — carries
    soundness).

    Decorrelation: tile-major streams concentrate one tile's near-ties
    into adjacent columns, which would saturate a contiguous bin and trip
    the certificate on dense neighborhoods (measured: one such query per
    10⁴ once forced a streaming rerun).

    * ``layout="axis1"`` (default): bins are STRIDED column groups
      {b, b+bins2, …} reduced over the second-minor axis — members sample
      across tiles *by construction*, so no transpose is needed at all,
      and the reduce avoids cross-lane shuffles (same win as the level-1
      axis1 scan layout, experiments/scan_anatomy4.py).
    * ``layout="lane"``: contiguous 128-column bins, lane-axis reduce;
      ``nt`` (the tile count) triggers an explicit (bin-slot, tile)
      transpose first.

    Returns (scores (B, kp), ids (B, kp), worst2 (B,) — the min over bins
    of the ``rounds``-th kept value, +inf where bins never saturated).
    """
    B, W = out_s.shape
    if layout != "axis1" and nt is not None and nt > 1 and W % nt == 0:
        rb = W // nt
        out_s = out_s.reshape(B, nt, rb).swapaxes(1, 2).reshape(B, W)
        out_i = out_i.reshape(B, nt, rb).swapaxes(1, 2).reshape(B, W)
    BIN = 128
    Wp = -(-W // BIN) * BIN
    if Wp != W:
        out_s = jnp.pad(
            out_s, ((0, 0), (0, Wp - W)), constant_values=jnp.inf
        )
    bins2 = Wp // BIN
    # the reduced stream must still be able to hold kp candidates
    rounds = min(max(rounds, -(-kp // bins2)), BIN)
    if layout == "axis1":
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, BIN, bins2), 1)
        d3 = out_s.reshape(B, BIN, bins2)
        red_axis = 1
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bins2, BIN), 2)
        d3 = out_s.reshape(B, bins2, BIN)
        red_axis = 2
    packed = (
        jax.lax.bitcast_convert_type(d3, jnp.int32) & jnp.int32(~0x7F)
    ) | lane
    outs = []
    for rnd in range(rounds):
        m = jnp.min(packed, axis=red_axis)
        outs.append(m)
        if rnd + 1 < rounds:
            sel = (
                (m & jnp.int32(0x7F))[:, None, :]
                if red_axis == 1
                else (m & jnp.int32(0x7F))[:, :, None]
            )
            packed = jnp.where(lane == sel, jnp.int32(0x7F800000), packed)
    keys = jnp.stack(outs, axis=1)                  # (B, rounds, bins2)
    worst2 = jnp.min(
        jax.lax.bitcast_convert_type(
            keys[:, -1, :] & jnp.int32(~0x7F), jnp.float32
        ),
        axis=1,
    )
    colb = jax.lax.broadcasted_iota(jnp.int32, (1, rounds, bins2), 2)
    if layout == "axis1":
        # column = slice·bins2 + bin  (strided groups)
        col = (
            (keys & jnp.int32(0x7F)) * bins2 + colb
        ).reshape(B, rounds * bins2)
    else:
        col = (
            colb * BIN + (keys & jnp.int32(0x7F))
        ).reshape(B, rounds * bins2)
    d2 = jax.lax.bitcast_convert_type(
        keys & jnp.int32(~0x7F), jnp.float32
    ).reshape(B, rounds * bins2)
    kp = min(kp, rounds * bins2)
    top_neg, idx = jax.lax.top_k(-d2, kp)
    sel_col = jnp.take_along_axis(col, idx, axis=1)
    # padding columns carry +inf scores and clip safely into [0, W)
    gids = jnp.take_along_axis(
        out_i, jnp.minimum(sel_col, W - 1), axis=1
    )
    return -top_neg, gids, worst2
