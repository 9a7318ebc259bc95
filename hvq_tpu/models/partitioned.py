"""Partitioned exact engine — predicate-pruned scans over sorted views.

The reference scans ALL sn rows for every query and discards predicate
failures one branch at a time (optimized.hpp:84-117). This engine instead
resolves each query's predicate to a contiguous row range of a sorted view by
host-side binary search (index.partition), takes the union of database tiles
those ranges touch for a whole query batch, and scans only those tiles on
device — the filtered query types do work proportional to their selectivity,
not to the database size, while staying exact.

Query routing (host):
  type 0          → cat_view, full range (dense scan, no pruning possible)
  type 1 (C==v)   → cat_view, the category partition
  type 3          → cat_view, partition narrowed by T binary search
  type 2 (l≤T≤r)  → time_view, one global T range

Batches are grouped per view; tile lists are padded to power-of-two buckets
so jit specializations stay bounded. Results carry original ids throughout
(sample-proportion and padding semantics identical to the other engines).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.index.partition import (
    PartitionedIndex,
    pad_tile_list,
    tiles_for_ranges,
)
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import pad_vectors_np, resolve_precision
from hvq_tpu.utils.formats import Dataset, QuerySet


class PartitionedEngine:
    """Exact engine with category/timestamp tile pruning."""

    name = "partitioned"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int = 8192,
        query_batch: int = 256,
        kprime: int = 128,
        dtype=jnp.float32,
        precision: str = "highest",
        topk_strategy: str = "topk",
        index: PartitionedIndex | None = None,
    ):
        self.index = index or PartitionedIndex.build(
            ds, db_tile=db_tile, dtype=dtype
        )
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=kprime))
        self.query_batch = query_batch
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        self.topk_strategy = topk_strategy
        self.compute_dtype = dtype
        self._jit = jax.jit(self._search_pruned, static_argnames=("k",))
        # Wide-range batches (type 0 and broad ranges) skip pruning and use
        # the deferred-bin full scan instead — ~7× cheaper per tile than the
        # streaming top-k merge. Bin collisions stay random because vectors
        # are independent of the (C, T) sort order.
        from hvq_tpu.ops.pallas_scan import choose_bin_top

        self.bin_top = choose_bin_top(self.index.cat_view.n_pad, kprime)
        self._jit_full = jax.jit(self._search_full, static_argnames=("k",))

    # --- jitted core -----------------------------------------------------
    def _search_pruned(
        self,
        Vp_view, C_view, T_view, dn_view, oid_view,  # flat view arrays
        tail_V,
        tile_index,              # (nt_sel,) int32, -1 = skip
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        Dt = self.index.cat_view.db_tile
        nt = Vp_view.shape[0] // Dt
        scores, pos = common.scan_database(
            (
                Vp_view.reshape(nt, Dt, Vp_view.shape[-1]),
                C_view.reshape(nt, Dt),
                T_view.reshape(nt, Dt),
                dn_view.reshape(nt, Dt),
            ),
            qb,
            sn,
            kprime=self.kprime,
            db_tile=self.index.cat_view.db_tile,
            precision=self.precision,
            strategy=self.topk_strategy,
            compute_dtype=self.compute_dtype,
            oid_tiles=oid_view.reshape(nt, Dt),
            tile_index=tile_index,
        )
        return common.finalize_view(
            scores, pos, Vp_view, oid_view, tail_V, qb, n, k
        )

    def _search_full(
        self,
        Vp_view, C_view, T_view, dn_view, oid_view,
        tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        from hvq_tpu.ops.pallas_scan import deferred_bin_scan_xla

        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        # The mask tests original ids (sample-proportion is over file order);
        # the reported payload is the VIEW POSITION so refinement gathers
        # stay local to the view.
        pos = jnp.arange(Vp_view.shape[0], dtype=jnp.int32)
        out_s, out_i = deferred_bin_scan_xla(
            Vp_view, C_view, T_view, dn_view, oid_view,
            qb.qV, qb.active_c, qb.v, qb.active_t, qb.l, qb.r, sn,
            db_tile=self.index.cat_view.db_tile, bin_top=self.bin_top,
            precision=self.precision,
            payload=pos,
        )
        kp = min(self.kprime, out_s.shape[1])
        top_neg, idx = jax.lax.top_k(-out_s, kp)
        scores = -top_neg
        cand_pos = jnp.take_along_axis(out_i, idx, axis=1)
        return common.finalize_view(
            scores, cand_pos, Vp_view, oid_view, tail_V, qb, n, k
        )

    # --- host driver -----------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        idx = self.index
        n = idx.cat_view.n
        sn_val = int(sample_proportion * n)
        view_id, start, end = idx.query_ranges(qs.qtype, qs.v, qs.l, qs.r)

        ids_out = np.empty((qs.m, k), dtype=np.uint32)
        dists_out = np.empty((qs.m, k), dtype=np.float32)

        # Route per query: ranges wide enough for a sound bin-reduce use the
        # fast deferred full scan; narrow ranges use pruned tile scans. A
        # narrow range on a sorted view concentrates candidates in few bins,
        # where a bin reduce would lose neighbors — hence per-query gating.
        from hvq_tpu.ops.pallas_scan import choose_bin_top

        span = end - start
        full_ok = np.zeros(qs.m, dtype=bool)
        if self.bin_top is not None:
            for i in range(qs.m):
                r_bt = choose_bin_top(int(span[i]), self.kprime)
                full_ok[i] = r_bt is not None and r_bt <= self.bin_top

        for vid, view in ((0, idx.cat_view), (1, idx.time_view)):
            for full in (True, False):
                q_idx = np.nonzero((view_id == vid) & (full_ok == full))[0]
                if q_idx.size == 0:
                    continue
                for s in range(0, q_idx.size, self.query_batch):
                    batch_idx = q_idx[s : s + self.query_batch]
                    ids_b, d_b = self._run_batch(
                        view, batch_idx, qs, start, end, sn_val, n, k,
                        full=full,
                    )
                    ids_out[batch_idx] = ids_b[: batch_idx.size]
                    dists_out[batch_idx] = d_b[: batch_idx.size]
        return ids_out, dists_out

    def _run_batch(self, view, batch_idx, qs, start, end, sn_val, n, k,
                   full: bool = False):
        B = self.query_batch
        bsz = batch_idx.size

        def pad(a, fill=0.0):
            out = np.full(B, fill, dtype=a.dtype)
            out[:bsz] = a[batch_idx]
            return out

        qV = np.zeros((B, _c.PADDED_DIM), np.float32)
        qV[:bsz] = pad_vectors_np(qs.V[batch_idx].astype(np.float32))
        qargs = (
            jnp.asarray(qV),
            jnp.asarray(pad(qs.qtype)),
            jnp.asarray(pad(qs.v, -1.0)),
            jnp.asarray(pad(qs.l, -1.0)),
            jnp.asarray(pad(qs.r, -1.0)),
        )
        scalars = (jnp.int32(sn_val), jnp.int32(n))

        if full:
            ids_b, d_b = self._jit_full(
                view.Vp, view.C, view.T, view.d_norms, view.oid,
                self.tail_V, *qargs, *scalars, k=k,
            )
        else:
            tiles = tiles_for_ranges(
                start[batch_idx], end[batch_idx], view.db_tile,
                view.num_tiles,
            )
            ids_b, d_b = self._jit(
                view.Vp, view.C, view.T, view.d_norms, view.oid,
                self.tail_V,
                jnp.asarray(pad_tile_list(tiles)),
                *qargs, *scalars, k=k,
            )
        return np.asarray(ids_b).astype(np.uint32), np.asarray(d_b)
