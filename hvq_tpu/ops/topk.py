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
