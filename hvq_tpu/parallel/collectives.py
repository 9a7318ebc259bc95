"""Cross-device top-k merge — ``Knn::merge`` over ICI.

The reference merges per-thread top-k structures serially on one core after a
pool barrier (include/optimized_impl.h:337-385, optimized_parallel.hpp:142-146).
The TPU-native equivalent (SURVEY.md §2b): every device holds a (B, k') local
result tile; an ``all_gather`` over the ``"d"`` mesh axis moves all
``ndev × k'`` candidates (tiny: k'=128 floats+ids) onto every device, and one
exact ``lax.top_k`` over the concatenation yields the replicated global
result. For large meshes a ``ppermute`` tree-merge would halve traffic, but at
k'=128 the all-gather is already microseconds over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def allgather_topk_merge(
    scores: jnp.ndarray,  # (B, k') local, +inf = empty slot
    ids: jnp.ndarray,     # (B, k') global ids
    kprime: int,
    axis_name: str = "d",
):
    """Inside shard_map/pmap: merge per-device top-k' into the global top-k'."""
    # (ndev, B, k') — concatenate along the candidate axis, not the batch axis.
    g_scores = jax.lax.all_gather(scores, axis_name)
    g_ids = jax.lax.all_gather(ids, axis_name)
    ndev = g_scores.shape[0]
    B = scores.shape[0]
    flat_s = jnp.moveaxis(g_scores, 0, 1).reshape(B, ndev * scores.shape[1])
    flat_i = jnp.moveaxis(g_ids, 0, 1).reshape(B, ndev * ids.shape[1])
    top_neg, top_idx = jax.lax.top_k(-flat_s, kprime)
    return -top_neg, jnp.take_along_axis(flat_i, top_idx, axis=1)
