"""IVF approximate engine — selectivity-routed probes over a bucketed index.

The approximate mode the reference never built (its "optimized" engines are
exact scans; the contest task is nominally ANN — SURVEY.md §0). Per query
batch:

  1. score bucket centroids: ‖c‖² − 2·Q·Cᵀ on the MXU           (B, nb)
  2. take the top ``p`` buckets per query                        (B, p)
  3. gather the probed buckets' rows — contiguous cap-row blocks (B, p·cap)
  4. exact fp32 distances + fused predicate masks on the gather
  5. top-k + the standard tail-padding finalization

**Filtered probes** (BASELINE.json config 4): a predicate with selectivity
``s`` thins every bucket, so the probe count scales as ``nprobe / s`` —
estimated on the host from attribute statistics collected at index-build
time (category histogram + timestamp CDF sample; vectors are never
consulted). When the scaled probe count approaches a full scan
(``> exact_frac · nb``), the query routes to an **exact masked scan over the
IVF view itself** — same memory, full recall, and still the batched-matmul
scan path. Probe counts are bucketed to powers of two so jit
specializations stay bounded.

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
from hvq_tpu.ops.distance import exact_distances, pad_vectors_np
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
        kmeans_iters: int = 8,
        n_clusters: int | None = None,
        seed: int = 0,
        index: IVFIndex | None = None,
    ):
        self.index = index or IVFIndex.build(
            ds, cap=cap, n_clusters=n_clusters, iters=kmeans_iters, seed=seed
        )
        self.nprobe = min(nprobe, self.index.num_buckets)
        self.exact_frac = exact_frac
        self.query_batch = query_batch
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=128))
        self._probe_jit = jax.jit(
            self._probe_batch, static_argnames=("nprobe", "k")
        )
        self._scan_jit = jax.jit(self._scan_batch, static_argnames=("k",))

    # --- jitted probe path -----------------------------------------------
    def _probe_batch(
        self,
        Vp, C, T, oid, cents, c_norms, tail_V,
        qV, qtype, v, l, r,
        sn, n,
        nprobe: int,
        k: int,
    ):
        idx = self.index
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)

        # 1-2: rank buckets on the MXU, take top-nprobe per query.
        c_scores = c_norms[None, :] - 2.0 * jax.lax.dot_general(
            qV, cents,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        _, buckets = jax.lax.top_k(-c_scores, nprobe)      # (B, p)

        # 3-4: scan over probes — each step gathers ONE bucket per query
        # (a contiguous cap-row block), computes exact masked distances, and
        # merges into a running top-k. Bounds the working set at
        # (B, cap, 128) instead of materializing all probes at once (a
        # (B, p·cap, 128) gather at defaults is ~2 GB and crashes the
        # compiler on some runtimes).
        from hvq_tpu.ops import topk as topk_ops

        B = qV.shape[0]
        lane = jnp.arange(idx.cap, dtype=jnp.int32)
        init = (
            jnp.full((B, k), jnp.inf, jnp.float32),
            jnp.zeros((B, k), jnp.int32),
        )

        def probe_step(carry, bucket_j):                   # bucket_j: (B,)
            pos = bucket_j[:, None] * idx.cap + lane[None, :]   # (B, cap)
            rows = jnp.take(Vp, pos, axis=0)               # (B, cap, 128)
            d = exact_distances(qb.qV, rows)
            Cg = jnp.take(C, pos, axis=0)
            Tg = jnp.take(T, pos, axis=0)
            oidg = jnp.take(oid, pos, axis=0)
            ok = (oidg < sn)
            ok &= (~active_c[:, None]) | (Cg == vv[:, None])
            ok &= (~active_t[:, None]) | (
                (Tg >= ll[:, None]) & (Tg <= rr[:, None])
            )
            d = jnp.where(ok, d, jnp.inf)
            merged = topk_ops.merge_topk(
                carry[0], carry[1], d, oidg.astype(jnp.int32), k
            )
            return merged, None

        (d_top, ids_top), _ = jax.lax.scan(
            probe_step, init, jnp.moveaxis(buckets, 1, 0)
        )

        # 5: distances already exact — reference tail padding + final sort.
        return common.finalize_with_tail(d_top, ids_top, tail_V, qb, n, k)

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
            kprime=max(128, k),
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
    ) -> tuple[np.ndarray, np.ndarray]:
        idx = self.index
        sn = jnp.int32(int(sample_proportion * idx.n))
        n_t = jnp.int32(idx.n)
        B = self.query_batch
        nb = idx.num_buckets

        # Route: probes scaled by 1/selectivity, bucketed to powers of two;
        # near-full-scan probe counts go to the exact masked scan instead.
        sel = idx.selectivity(qs.qtype, qs.v, qs.l, qs.r)
        need = np.ceil(self.nprobe / np.maximum(sel, 1e-9))
        exact = need > max(self.exact_frac * nb, self.nprobe)
        np_eff = np.minimum(
            2 ** np.ceil(np.log2(np.maximum(need, 1))).astype(np.int64), nb
        )
        np_eff[exact] = 0  # marker

        ids_out = np.empty((qs.m, k), dtype=np.uint32)
        dists_out = np.empty((qs.m, k), dtype=np.float32)
        for p in np.unique(np_eff):
            q_idx = np.nonzero(np_eff == p)[0]
            for s in range(0, q_idx.size, B):
                batch_idx = q_idx[s : s + B]
                if p == 0:
                    ids_b, d_b = self._run_scan(batch_idx, qs, sn, n_t, k)
                else:
                    ids_b, d_b = self._run_probe(
                        batch_idx, qs, sn, n_t, int(p), k
                    )
                ids_out[batch_idx] = ids_b[: batch_idx.size]
                dists_out[batch_idx] = d_b[: batch_idx.size]
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

    def _run_probe(self, batch_idx, qs, sn, n_t, nprobe, k):
        idx = self.index
        qargs = self._query_args(batch_idx, qs)
        ids_b, d_b = self._probe_jit(
            idx.Vp, idx.C, idx.T, idx.oid, idx.centroids, idx.c_norms,
            self.tail_V, *qargs, sn, n_t, nprobe=nprobe, k=k,
        )
        return np.asarray(ids_b).astype(np.uint32), np.asarray(d_b)

    def _run_scan(self, batch_idx, qs, sn, n_t, k):
        idx = self.index
        qargs = self._query_args(batch_idx, qs)
        ids_b, d_b = self._scan_jit(
            idx.Vp, idx.C, idx.T, idx.d_norms, idx.oid,
            self.tail_V,
            *qargs, sn, n_t, k=k,
        )
        return np.asarray(ids_b).astype(np.uint32), np.asarray(d_b)
