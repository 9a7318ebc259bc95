"""Batched exact engine — the single-chip flagship (optimized.hpp analogue).

Where the reference streams one candidate at a time through an AVX2 distance
kernel into a 100-slot array (include/optimized.hpp:54-146), this engine:

* batches ``query_batch`` queries into one (B, 128) block,
* scans the database in ``db_tile``-row tiles under ``lax.scan``,
* computes each (B, Dt) distance tile as a ‖d‖² − 2·Q·Dᵀ MXU matmul with the
  predicate mask fused in (ops.distance / ops.masks),
* carries a running (B, k') top-k' through the scan (ops.topk),
* exactly re-refines the k' survivors in fp32 and applies the reference's
  pad-to-k semantics (models.common.finalize).

Everything under ``jit`` is shape-static: query count is padded to the batch
size, database rows to the tile size; ``sn`` (sample proportion) and ``n``
ride through as traced scalars so changing them never recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.models.device_db import DeviceDB
from hvq_tpu.ops.distance import resolve_precision
from hvq_tpu.utils.formats import Dataset, QuerySet


class BatchedEngine:
    """TPU-native batched exact scan engine."""

    name = "batched"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int = 8192,
        query_batch: int = 256,
        kprime: int = 128,
        dtype=jnp.float32,
        precision: str = "highest",
        topk_strategy: str = "topk",
        device_db: DeviceDB | None = None,
    ):
        self.db = device_db or DeviceDB.from_dataset(
            ds, db_tile=db_tile, dtype=dtype
        )
        self.query_batch = query_batch
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        self.topk_strategy = topk_strategy
        self.compute_dtype = dtype
        self._search_jit = jax.jit(
            self._search_batch, static_argnames=("self_k",)
        )

    # --- jitted core -----------------------------------------------------
    def _search_batch(
        self,
        Vt, Ct, Tt, dnt,        # database tile views
        Vp,                     # flat (n_pad, 128) vectors for refinement
        qV, qtype, v, l, r,     # raw query batch arrays
        sn, n,                  # traced scalars
        self_k: int,
    ):
        from hvq_tpu.ops import masks as mask_ops

        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        scores, ids = common.scan_database(
            (Vt, Ct, Tt, dnt),
            qb,
            sn,
            kprime=self.kprime,
            db_tile=self.db.db_tile,
            precision=self.precision,
            strategy=self.topk_strategy,
            compute_dtype=self.compute_dtype,
        )
        return common.finalize(scores, ids, Vp, qb, n, self_k)

    # --- host driver -----------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        from hvq_tpu.ops.distance import pad_vectors_np

        n = self.db.n
        sn = jnp.int32(int(sample_proportion * n))
        n_t = jnp.int32(n)
        Vt, Ct, Tt, dnt = self.db.tiles()
        B = self.query_batch

        Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
        qVp_all = pad_vectors_np(Vq.astype(np.float32), _c.PADDED_DIM)

        ids_out = np.empty((m_pad, k), dtype=np.uint32)
        dists_out = np.empty((m_pad, k), dtype=np.float32)
        for s in range(0, m_pad, B):
            e = s + B
            ids_b, d_b = self._search_jit(
                Vt, Ct, Tt, dnt,
                self.db.Vp,
                jnp.asarray(qVp_all[s:e]),
                jnp.asarray(qtype[s:e]),
                jnp.asarray(v[s:e]),
                jnp.asarray(l[s:e]),
                jnp.asarray(r[s:e]),
                sn, n_t,
                self_k=k,
            )
            ids_out[s:e] = np.asarray(ids_b).astype(np.uint32)
            dists_out[s:e] = np.asarray(d_b)
        return ids_out[: qs.m], dists_out[: qs.m]
