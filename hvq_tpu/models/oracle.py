"""Exact brute-force oracle — the readable correctness reference.

Plays the role of the reference's baseline engine (include/baseline.hpp:68-190)
in the differential test strategy (SURVEY.md §4): every optimized engine is
validated against this implementation under the 0.002 distance tolerance.

Semantics reproduced exactly (shared by all three reference engines):

* only the first ``sn = floor(sample_proportion * n)`` records are scanned
  (baseline.hpp:107, optimized.hpp:85);
* the squared-L2 distance skips the two attribute dims (io.h:38-48);
* predicates: type 0 none, type 1 ``C == v`` (float equality — C is
  discretized), type 2 ``l <= T <= r``, type 3 both (optimized.hpp:84-117);
* when fewer than k candidates pass, the result is padded with tail ids
  ``n-1, n-2, ...`` — taken from the *full* dataset regardless of ``sn`` or
  the predicate, with their true distances, duplicates allowed — until
  exactly k entries exist (optimized.hpp:120-128); everything is then sorted
  ascending by distance (optimized_impl.h:392-437).

Pure NumPy, query-at-a-time: O(m·sn·d). Use only for small configs and tests.
"""

from __future__ import annotations

import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.utils.formats import Dataset, QuerySet


def predicate_mask_np(
    ds: Dataset, qtype: int, v: float, l: float, r: float, sn: int
) -> np.ndarray:
    """Boolean mask over the first sn records for one query's predicate."""
    C, T = ds.C[:sn], ds.T[:sn]
    mask = np.ones(sn, dtype=bool)
    if qtype in (1, 3):
        mask &= C == np.float32(v)
    if qtype in (2, 3):
        mask &= (T >= np.float32(l)) & (T <= np.float32(r))
    return mask


def search_oracle(
    ds: Dataset,
    qs: QuerySet,
    k: int = _c.K_DEFAULT,
    sample_proportion: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact hybrid k-NN. Returns (ids (m,k) uint32, dists (m,k) float32)."""
    n = ds.n
    if n < k:
        raise ValueError(f"dataset has {n} < k={k} records")
    sn = int(sample_proportion * n)
    V64 = ds.V.astype(np.float64)  # high-precision oracle distances
    ids_out = np.empty((qs.m, k), dtype=np.uint32)
    dists_out = np.empty((qs.m, k), dtype=np.float32)

    for i in range(qs.m):
        mask = predicate_mask_np(
            ds, int(qs.qtype[i]), qs.v[i], qs.l[i], qs.r[i], sn
        )
        cand = np.nonzero(mask)[0]
        q = qs.V[i].astype(np.float64)
        if cand.size < k:
            # Pad with tail ids n-1, n-2, ... (duplicates allowed) until k
            # total entries exist (optimized.hpp:120-128).
            pad = np.arange(n - 1, n - 1 - (k - cand.size), -1, dtype=np.int64)
            cand = np.concatenate([cand, pad])
        # chunked so the (|cand|, 100) float64 temp never exceeds ~1 GB
        d = np.empty(cand.size, np.float64)
        for s in range(0, cand.size, 1 << 20):
            e = min(s + (1 << 20), cand.size)
            diff = V64[cand[s:e]] - q
            d[s:e] = np.einsum("jd,jd->j", diff, diff)
        order = np.argsort(d, kind="stable")[:k]
        ids_out[i] = cand[order].astype(np.uint32)
        dists_out[i] = d[order].astype(np.float32)

    return ids_out, dists_out


class OracleEngine:
    """Engine-protocol wrapper around :func:`search_oracle`."""

    name = "oracle"

    def __init__(self, ds: Dataset, **_unused):
        self.ds = ds

    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        return search_oracle(self.ds, qs, k=k, sample_proportion=sample_proportion)
