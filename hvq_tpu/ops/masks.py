"""Predicate masks — the TPU-native form of the reference's branchy dispatch.

The reference dispatches on query type with four separate scan loops, each
testing the predicate per candidate with scalar branches
(optimized.hpp:84-117). On TPU, branches become masks: every query type is
served by one uniform formula

    ok = in_range & (no_C_constraint | C == v) & (no_T_constraint | l<=T<=r)

evaluated for a whole (query_batch × db_tile) block on the VPU and fused by
XLA into the distance tile. Masked-out candidates get distance +inf, which
also subsumes the reference's pad-to-k logic: masked rows simply lose to real
candidates, and the tail-id fill applies only in the degenerate <k case
(SURVEY.md §7, "idiomatic inversion").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def query_predicate_fields(qtype, v, l, r):
    """Decode per-query predicate activation from the query-type field.

    Types (reference README.md:48-53): 0 = none, 1 = C==v, 2 = l<=T<=r,
    3 = both. Returns (active_c, v, active_t, l, r) with bool activations.
    """
    qtype = jnp.asarray(qtype)
    active_c = (qtype == 1) | (qtype == 3)
    active_t = (qtype == 2) | (qtype == 3)
    return active_c, jnp.asarray(v), active_t, jnp.asarray(l), jnp.asarray(r)


def block_mask(C_tile, T_tile, gid_tile, sn, active_c, v, active_t, l, r):
    """(B, Dt) bool mask: which candidates in this tile pass each query.

    ``gid_tile < sn`` reproduces the reference's sample-proportion scan limit
    (optimized.hpp:85 ``j < sn``) and simultaneously masks the alignment
    padding rows appended past the true dataset end.

    C equality is exact float comparison, as in the reference
    (optimized.hpp:93 ``nodes[j][0] == v``) — C is discretized by contract.
    """
    in_range = gid_tile[None, :] < sn
    c_ok = (~active_c[:, None]) | (C_tile[None, :] == v[:, None])
    t_ok = (~active_t[:, None]) | (
        (T_tile[None, :] >= l[:, None]) & (T_tile[None, :] <= r[:, None])
    )
    return in_range & c_ok & t_ok


def predicate_selectivity(mask: np.ndarray) -> float:
    """Fraction of candidates passing — diagnostic for index-layer routing."""
    mask = np.asarray(mask)
    return float(mask.mean()) if mask.size else 0.0
