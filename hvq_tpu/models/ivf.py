"""IVF approximate engine — bucket-major probes over a clustered layout.

The approximate mode the reference never built (its "optimized" engines are
exact scans; the contest task is nominally ANN — SURVEY.md §0). Execution is
**bucket-major**, the TPU-friendly inversion of classic per-query inverted
lists (row-granular gathers crawl on TPU; measured 30× slower than the
dense scan at equal bytes):

  1. rank bucket centroids for the whole query set on the MXU; take each
     query's top ``nprobe`` buckets                       (one dispatch)
  2. host: union the probed buckets of each query batch — every bucket is a
     contiguous cap-row slab of the view
  3. device: stream the union slabs (tile-granular dynamic slices run at
     full HBM bandwidth) through the certified per-tile top-k merge — the
     dense scan's shape, over union·cap rows instead of n. Bin reduces are
     deliberately NOT used here: clustered queries concentrate their whole
     top-k inside a couple of probed buckets, where per-bin candidate caps
     lose neighbors wholesale
  4. exact fp32 refinement of the survivors + reference tail padding

Scanning the union instead of per-query lists can only ADD candidates per
query, so per-query recall is ≥ classic IVF recall at the same nprobe.
Batches whose union approaches the whole index degrade gracefully to dense-
scan cost (the regime where IVF fundamentally cannot help).

**Filtered probes** (BASELINE.json config 4): a predicate with selectivity
``s`` thins every bucket, so the probe count scales as ``nprobe / s`` —
estimated from attribute statistics collected at build time (category
histogram + timestamp CDF; vectors are never consulted). When the scaled
count approaches a full scan, the query routes to an **exact masked scan of
the IVF view itself** — same memory, full recall. Probe counts are bucketed
to powers of two so jit specializations stay bounded.

Recall is gated ≥ 0.99 against the oracle (tests/test_ivf.py); uniform
i.i.d. vectors (the reference generator's distribution, write_data.c:38)
have no neighbor structure and are the documented worst case for any ANN
index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.index.ivf import IVFIndex
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import pad_vectors_np
from hvq_tpu.utils.formats import Dataset, QuerySet


class IVFEngine:
    """Approximate bucketed-IVF engine with selectivity-aware routing."""

    name = "ivf"

    def __init__(
        self,
        ds: Dataset,
        cap: int = 1024,
        nprobe: int = 16,
        exact_frac: float = 0.25,
        query_batch: int = 256,
        kprime: int = 128,
        kmeans_iters: int = 8,
        n_clusters: int | None = None,
        seed: int = 0,
        index: IVFIndex | None = None,
        # Byte budget for the FLAT union path: a carry-free scan emits every
        # slab's (B, cap) score tile and ONE lax.top_k selects over the flat
        # (B, W) stream — no per-tile merge (the 12×-the-matmul cost the
        # streaming path pays, DESIGN.md §3), no bin reduce (unsound under
        # clustering). Unions whose score stream exceeds the budget fall
        # back to the streaming per-tile merge.
        flat_budget_bytes: int = 512 * 1024 * 1024,
    ):
        self.index = index or IVFIndex.build(
            ds, cap=cap, n_clusters=n_clusters, iters=kmeans_iters, seed=seed
        )
        self.nprobe = min(nprobe, self.index.num_buckets)
        self.exact_frac = exact_frac
        self.query_batch = query_batch
        self.kprime = kprime
        self.flat_budget_bytes = int(flat_budget_bytes)
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=kprime))
        self._rank_jit = jax.jit(self._rank_buckets, static_argnames=("p",))
        self._union_jit = jax.jit(self._union_scan, static_argnames=("k",))
        self._union_flat_jit = jax.jit(
            self._union_scan_flat, static_argnames=("k",)
        )
        self._scan_jit = jax.jit(self._scan_batch, static_argnames=("k",))

    # --- jitted stages -----------------------------------------------------
    def _rank_buckets(self, cents, c_norms, qV, p: int):
        """(m, p) probed bucket ids for all queries, one dispatch."""
        c_scores = c_norms[None, :] - 2.0 * jax.lax.dot_general(
            qV, cents,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        _, buckets = jax.lax.top_k(-c_scores, p)
        return buckets.astype(jnp.int32)

    def _union_scan(
        self,
        Vp, C, T, dn, oid, tail_V,
        tile_index,                  # (nt_sel,) bucket ids, -1 = padding
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        # NOTE: bucket scans must use the certified per-tile top-k merge,
        # never a bin reduce — clustered queries concentrate their whole
        # top-k inside one or two probed buckets, the exact regime where a
        # per-bin candidate cap loses neighbors wholesale.
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        cap = self.index.cap
        nt = Vp.shape[0] // cap
        scores, pos = common.scan_database(
            (
                Vp.reshape(nt, cap, Vp.shape[-1]),
                C.reshape(nt, cap),
                T.reshape(nt, cap),
                dn.reshape(nt, cap),
            ),
            qb,
            sn,
            kprime=self.kprime,
            db_tile=cap,
            oid_tiles=oid.reshape(nt, cap),
            tile_index=tile_index,
        )
        return common.finalize_view(scores, pos, Vp, oid, tail_V, qb, n, k)

    def _union_scan_flat(
        self,
        Vp, C, T, dn, oid, tail_V,
        tile_index,                  # (nt_sel,) bucket ids, -1 = padding
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        """Flat union path: carry-free slab scan + ONE top-k over (B, W).

        The streaming merge pays a per-tile ``lax.top_k`` (the exact path's
        measured 12×-the-matmul cost); bin reduces are unsound here because
        clustering concentrates a query's whole top-k inside a couple of
        probed buckets. Keeping EVERY score until a single flat ``top_k``
        is both exact (no candidate ever dropped before selection) and
        cheap while W = nt_sel·cap fits the byte budget — the low-batch /
        low-latency regime IVF exists for. Masked (-1) slots surface as
        +inf scores and lose to any real candidate.
        """
        from hvq_tpu.ops.distance import tile_scores

        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        cap = self.index.cap
        nt = Vp.shape[0] // cap
        B = qV.shape[0]
        Vt = Vp.reshape(nt, cap, Vp.shape[-1])
        Ct = C.reshape(nt, cap)
        Tt = T.reshape(nt, cap)
        dnt = dn.reshape(nt, cap)
        oidt = oid.reshape(nt, cap)
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
        ti = jnp.asarray(tile_index, jnp.int32)
        qVf = qV.astype(jnp.float32)

        def step(_, t):
            safe = jnp.maximum(t, 0)
            V_tile = jax.lax.dynamic_index_in_dim(Vt, safe, keepdims=False)
            C_tile = jax.lax.dynamic_index_in_dim(Ct, safe, keepdims=False)
            T_tile = jax.lax.dynamic_index_in_dim(Tt, safe, keepdims=False)
            dn_tile = jax.lax.dynamic_index_in_dim(dnt, safe, keepdims=False)
            oid_tile = jax.lax.dynamic_index_in_dim(
                oidt, safe, keepdims=False
            )
            scores = tile_scores(
                qVf, V_tile, dn_tile, jax.lax.Precision.HIGHEST
            )
            ok = mask_ops.block_mask(
                C_tile, T_tile, oid_tile, sn,
                qb.active_c, qb.v, qb.active_t, qb.l, qb.r,
            )
            ok &= jnp.broadcast_to((t >= 0)[None, None], (B, cap))
            return None, jnp.where(ok, scores, jnp.inf)

        _, s_stack = jax.lax.scan(step, None, ti)      # (nt_sel, B, cap)
        nt_sel = ti.shape[0]
        W = nt_sel * cap
        s_flat = jnp.moveaxis(s_stack, 0, 1).reshape(B, W)
        kp = min(self.kprime, W)
        top_neg, flat_idx = jax.lax.top_k(-s_flat, kp)
        pos = (
            jnp.take(ti, flat_idx // cap) * cap + flat_idx % cap
        ).astype(jnp.int32)
        pos = jnp.maximum(pos, 0)                      # pad slots (score +inf)
        return common.finalize_view(
            -top_neg, pos, Vp, oid, tail_V, qb, n, k
        )

    # --- jitted exact-scan fallback (full masked scan of the IVF view) ----
    def _scan_batch(
        self,
        Vp_view, C_view, T_view, dn_view, oid_view,
        tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        Dt = self.index.scan_tile
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
            kprime=max(self.kprime, k),
            db_tile=Dt,
            oid_tiles=oid_view.reshape(nt, Dt),
        )
        return common.finalize_view(
            scores, pos, Vp_view, oid_view, tail_V, qb, n, k
        )

    # --- host driver -----------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
        return_dists: bool = True,
        phases=None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Engine-protocol search (same contract as the exact engines:
        ``return_dists=False`` skips the distance fetch — the reference's
        timed region is ids-only, src/test.cpp:95-110 — and ``phases``
        receives the route/probe/enqueue/fetch split)."""
        from hvq_tpu.utils.timing import maybe_phase

        idx = self.index
        sn = jnp.int32(int(sample_proportion * idx.n))
        n_t = jnp.int32(idx.n)
        B = self.query_batch
        nb = idx.num_buckets

        # Route: probes scaled by 1/selectivity, bucketed to powers of two;
        # near-full-scan probe counts go to the exact masked scan instead.
        with maybe_phase(phases, "search/route"):
            sel = idx.selectivity(qs.qtype, qs.v, qs.l, qs.r)
            need = np.ceil(self.nprobe / np.maximum(sel, 1e-9))
            exact = need > max(self.exact_frac * nb, self.nprobe)
            np_eff = np.minimum(
                2 ** np.ceil(np.log2(np.maximum(need, 1))).astype(np.int64),
                nb,
            )
            np_eff[exact] = 0  # exact-scan marker

        # Stage 1: probe rankings for all non-exact queries in one dispatch.
        probe_idx = np.nonzero(np_eff > 0)[0]
        buckets_all = None
        if probe_idx.size:
            with maybe_phase(phases, "search/probe"):
                p_max = int(np_eff[probe_idx].max())
                qV_probe = pad_vectors_np(
                    qs.V[probe_idx].astype(np.float32), _c.PADDED_DIM
                )
                buckets_all = np.asarray(
                    self._rank_jit(
                        idx.centroids, idx.c_norms, jnp.asarray(qV_probe),
                        p=p_max,
                    )
                )
                probe_row = np.full(qs.m, -1, np.int64)
                probe_row[probe_idx] = np.arange(probe_idx.size)

        ids_out = np.empty((qs.m, k), dtype=np.uint32)
        dists_out = (
            np.empty((qs.m, k), dtype=np.float32) if return_dists else None
        )
        # Enqueue every dispatch, fetch at the end (uploads overlap device
        # compute and the relay's per-call latency pipelines — same shape
        # as the exact engines' drivers).
        pending = []
        with maybe_phase(phases, "search/enqueue"):
            for p in np.unique(np_eff):
                q_idx = np.nonzero(np_eff == p)[0]
                for s in range(0, q_idx.size, B):
                    batch_idx = q_idx[s : s + B]
                    if p == 0:
                        out = self._run_scan(batch_idx, qs, sn, n_t, k)
                    else:
                        rows = probe_row[batch_idx]
                        probes = buckets_all[rows][:, : int(p)]
                        out = self._run_union(
                            batch_idx, qs, probes, sn, n_t, k
                        )
                    pending.append((batch_idx, out))
        with maybe_phase(phases, "search/fetch"):
            common.prefetch_host(
                a
                for _, (ids_b, d_b) in pending
                for a in ((ids_b, d_b) if return_dists else (ids_b,))
            )
            for batch_idx, (ids_b, d_b) in pending:
                ids_out[batch_idx] = np.asarray(ids_b)[
                    : batch_idx.size
                ].astype(np.uint32)
                if return_dists:
                    dists_out[batch_idx] = np.asarray(d_b)[: batch_idx.size]
        return ids_out, dists_out

    def _query_args(self, batch_idx, qs):
        B = self.query_batch
        bsz = batch_idx.size

        def pad(a, fill=0.0):
            out = np.full(B, fill, dtype=a.dtype)
            out[:bsz] = a[batch_idx]
            return out

        qV = np.zeros((B, _c.PADDED_DIM), np.float32)
        qV[:bsz] = pad_vectors_np(qs.V[batch_idx].astype(np.float32))
        return (
            jnp.asarray(qV),
            jnp.asarray(pad(qs.qtype)),
            jnp.asarray(pad(qs.v, -1.0)),
            jnp.asarray(pad(qs.l, -1.0)),
            jnp.asarray(pad(qs.r, -1.0)),
        )

    def _run_union(self, batch_idx, qs, probes, sn, n_t, k):
        idx = self.index
        union = np.unique(probes)
        nt_sel = max(1, int(union.size))
        size = 1 << (nt_sel - 1).bit_length()          # pow2 jit buckets
        tile_index = np.full(size, -1, np.int32)
        tile_index[: union.size] = union
        qargs = self._query_args(batch_idx, qs)
        # flat path while the (B, W) score stream fits the byte budget —
        # beyond it, the streaming per-tile merge caps device memory
        stream_bytes = self.query_batch * size * idx.cap * 4
        fn = (
            self._union_flat_jit
            if stream_bytes <= self.flat_budget_bytes
            else self._union_jit
        )
        return fn(
            idx.Vp, idx.C, idx.T, idx.d_norms, idx.oid, self.tail_V,
            jnp.asarray(tile_index),
            *qargs, sn, n_t, k=k,
        )

    def _run_scan(self, batch_idx, qs, sn, n_t, k):
        idx = self.index
        qargs = self._query_args(batch_idx, qs)
        return self._scan_jit(
            idx.Vp, idx.C, idx.T, idx.d_norms, idx.oid,
            self.tail_V,
            *qargs, sn, n_t, k=k,
        )
