"""Sharded partitioned engine — the routed flagship over a TPU mesh.

Round-2's measured winner on the mixed contest workload (partitioned:
grouped routed windows + certified deferred full scans) was single-chip
only; the reference's one parallelism axis is its *flagship's*
(optimized_parallel.hpp:100-146). This engine shards BOTH sorted views over
the mesh "d" axis — the index build is a pure permutation, so each device
holds a contiguous slab of every view — and runs each of the partitioned
engine's dispatch kinds where its data lives:

* FULL dense scans: the certified packed bin scan runs shard-locally
  (sample-proportion mask via the slab's ``oid`` column), candidates are
  exactly refined on the owning shard, converted to original ids there,
  and merged with the ``all_gather`` top-k' collective — the
  ``Knn::merge``-over-ICI pattern of models/sharded.py. Certificate terms
  (bin saturation after in-program repair, level-2, k'-cut) are
  ``pmin``-reduced over "d" per term, so forensics bitmasks
  (HVQ_CERT_TERMS=1) match the single-chip engines on the same layout.
* ROUTED grouped windows: a routed group's contiguous window lives inside
  ONE shard's slab by construction — the host packer never lets a group
  cross a slab boundary, and queries whose own predicate range straddles
  one (≲ cap/local_n of routed queries) take the dense path instead. Each
  dispatch carries an equal number of groups per shard (round-robin across
  the per-shard queues), so the mesh processes n_d groups' windows
  concurrently with ZERO collectives — each query is wholly owned by the
  shard that owns its window.
* WIDE TYPE-2 window scans are disabled on the mesh: the path's measured
  value is marginal even single-chip (7892 vs 7964 QPS at D=10⁷ — the
  second view's build cost outweighs the pruning; CHANGELOG r2), and wide
  ranges ride the sharded dense scan, which is exact for every type.

The reference's thread-pool analogue mapping is inherited from
models/sharded.py (SURVEY.md §2a/§2b); what this adds is sharding the
*pruned* layouts, so selectivity routing and multi-chip scaling compose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6 exports shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.models.batched import (
    _CERT_ABS,
    _CERT_REL_MM,
    _CERT_REL_T,
    bundle_ids,
)
from hvq_tpu.models.partitioned import PartitionedEngine
from hvq_tpu.index.partition import PartitionedIndex
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import exact_distances
from hvq_tpu.ops.pallas_scan import BIN, last_round_dists
from hvq_tpu.parallel.collectives import allgather_topk_merge
from hvq_tpu.parallel.mesh import make_mesh
from hvq_tpu.utils.formats import Dataset


class ShardedPartitionedEngine(PartitionedEngine):
    """Partitioned routing + certified dense scans over a "d" device mesh."""

    name = "partitioned_sharded"

    def __init__(
        self,
        ds: Dataset,
        mesh=None,
        db_tile: int | None = None,
        kprime: int | None = None,
        dtype=jnp.float32,
        bin_top: int | None = None,
        **kw,
    ):
        self.mesh = mesh or make_mesh()
        if self.mesh.shape.get("q", 1) != 1:
            raise ValueError(
                "partitioned_sharded shards the database only; put all "
                "devices on the 'd' axis (query parallelism is query_batch)"
            )
        self.n_d = self.mesh.shape["d"]
        # Resolve the tile size BEFORE the index build (the parent would,
        # but this subclass builds the index itself for row_multiple): the
        # v3 kernel — now the per-shard dense scan on TPU — wants 16384.
        if db_tile is None:
            _si = kw.get("scan_impl", "auto")
            db_tile = (
                16384
                if jax.devices()[0].platform == "tpu"
                and _si in ("auto", "pallas_v3")
                else 8192
            )
        index = PartitionedIndex.build(
            ds,
            db_tile=db_tile,
            dtype=dtype,
            row_multiple=self.n_d * db_tile,
            scan_store=kw.get("scan_store", "fp32"),
        )
        super().__init__(
            ds,
            db_tile=db_tile,
            kprime=kprime,
            dtype=dtype,
            index=index,
            bin_top=bin_top,
            **kw,
        )
        self._local_n = index.cat_view.n_pad // self.n_d
        # Bin depth is a property of each shard's LOCAL scan (stream width
        # and Poisson load are per-slab), exactly as models/sharded.py.
        if bin_top is None:
            from hvq_tpu.ops.pallas_scan import choose_bin_top

            # the packed scan bins 128-lane groups per tile: db_tile must
            # hold whole bins or the dense path streams (impl="xla")
            self.bin_top = (
                choose_bin_top(
                    self._local_n, self.kprime, certified=self.certified
                )
                if db_tile % BIN == 0
                else None
            )
        # Tiny-DB behavior diverges from the parent: with no sound bin
        # depth the dense path falls back to the per-shard STREAMING scan
        # (certified by construction) instead of forcing every query onto
        # a full-coverage routed bucket (whose cap could exceed a slab).
        self._route_all_fallback = False
        self._enable_window = False
        # Routed window caps must fit inside one shard slab.
        self.route_buckets = tuple(
            c for c in self.route_buckets if c <= self._local_n
        )
        self._tv_placed = False
        self._place_view(index.cat_view)
        self.tail_V = jax.device_put(
            self.tail_V, NamedSharding(self.mesh, P())
        )

    # --- mesh placement ----------------------------------------------------
    def _place_view(self, view):
        rows = NamedSharding(self.mesh, P("d"))
        view.Vp = jax.device_put(
            view.Vp, NamedSharding(self.mesh, P("d", None))
        )
        if view.V_scan is not None:
            view.V_scan = jax.device_put(
                view.V_scan, NamedSharding(self.mesh, P("d", None))
            )
        view.C = jax.device_put(view.C, rows)
        view.T = jax.device_put(view.T, rows)
        view.d_norms = jax.device_put(view.d_norms, rows)
        view.oid = jax.device_put(view.oid, rows)

    def _get_view(self, vid: int):
        if vid == 0:
            return self.index.cat_view
        tv = self.index.time_view
        if not self._tv_placed:
            self._place_view(tv)
            self._tv_placed = True
        return tv

    def _routable_extra(self, start, end):
        # A routed window must live inside ONE shard slab; spans straddling
        # a boundary (rare: ~cap/local_n of ranges) take the dense path.
        last = np.maximum(end - 1, start)
        return (start // self._local_n) == (last // self._local_n)

    # --- jitted cores --------------------------------------------------------
    def _sharded_scan(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
        bin_top: int | None,
        level2: bool,
        impl: str,
    ):
        """Per-shard scan of a sorted view + ICI merge.

        Same structure as ShardedEngine._search_batch (models/sharded.py)
        with the view deltas: the sample mask tests the slab's ``oid``
        column (original file order, reference optimized.hpp:85), repair
        gathers stay slab-local, and candidates convert to ORIGINAL ids on
        the owning shard before the all-gather merge — so finalization
        needs no cross-shard row gather (pads price from the replicated
        tail block). Returns (ids (B,k), dists (B,k), suspect (B,)).
        """
        db_tile = self.index.cat_view.db_tile
        kprime = self.kprime
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        B = qV.shape[0]

        def local_scan(Vp_l, Vs_l, C_l, T_l, dn_l, oid_l, qV_l, ac, vq,
                       at, lq, rq, sn_, n_):
            local_n = Vp_l.shape[0]
            nt = local_n // db_tile
            offset = jax.lax.axis_index("d") * local_n
            qb = common.QueryBatch(qV_l, ac, vq, at, lq, rq)
            inf = jnp.full((B,), jnp.inf, jnp.float32)
            cert_bin, cert_l2, cert_kc = inf, inf, inf
            if impl in ("xla_packed", "pallas_v3"):
                from hvq_tpu.ops.pallas_scan import (
                    deferred_packed_scan_xla,
                    fused_packed_scan_v3,
                    v3_query_block,
                )

                if impl == "pallas_v3":
                    # the fused Mosaic kernel runs shard-locally; the slab's
                    # oid column drives the sample mask, positions come back
                    # slab-local exactly like the XLA twin (VERDICT r3 #3)
                    out_s, out_i = fused_packed_scan_v3(
                        Vs_l, C_l, T_l, dn_l, oid_l,
                        qV_l, ac, vq, at, lq, rq, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        b_block=v3_query_block(B, 256),
                        interpret=self._interpret,
                    )
                else:
                    out_s, out_i = deferred_packed_scan_xla(
                        Vs_l, C_l, T_l, dn_l, oid_l,
                        qV_l, ac, vq, at, lq, rq, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        precision=self._scan_precision,
                        layout=self.scan_layout,
                    )
                W = out_s.shape[1]
                kp = min(kprime, W)
                worst2 = None
                # level-2 gates: see BatchedEngine (axis1 needs bins2 >=
                # 128, lane needs nt >= 128)
                l2_ok = (
                    W >= 16384 if self.scan_layout == "axis1" else nt >= 128
                )
                if level2 and W >= self.l2_min_w and l2_ok:
                    from hvq_tpu.ops.topk import binned_stream_topk

                    scores, pos_l, worst2 = binned_stream_topk(
                        out_s, out_i, kp, nt=nt, layout=self.scan_layout
                    )
                else:
                    top_neg, idx = jax.lax.top_k(-out_s, kp)
                    scores = -top_neg
                    pos_l = jnp.take_along_axis(out_i, idx, axis=1)
                gpos = pos_l + offset              # global VIEW positions
                if self.certified:
                    if kp < W:
                        cert_kc = scores[:, kp - 1]
                    if self.repair_bins:
                        # in-program bin repair, slab-local gathers
                        # (common.bin_repair_candidates; id_offset keeps
                        # the dedup compare in global view-position space)
                        thr_pre = (
                            common.repair_thr_pre(
                                scores, k, qV_l, self._dn_max,
                                self._rel_mm, _CERT_REL_T, _CERT_ABS,
                            )
                            if self.repair_gate
                            else None
                        )
                        scores, gpos, cert_bin = (
                            common.bin_repair_candidates(
                                out_s, scores, gpos, nt, bin_top,
                                db_tile // BIN, db_tile, self.scan_layout,
                                C_l, T_l, oid_l, qb, sn_,
                                self.repair_bins, id_offset=offset,
                                thr_pre=thr_pre,
                            )
                        )
                    else:
                        cert_bin = jnp.min(
                            last_round_dists(
                                out_s, nt, bin_top, db_tile // BIN
                            ),
                            axis=1,
                        )
                    if worst2 is not None:
                        cert_l2 = worst2
            else:
                tiles = (
                    Vp_l.reshape(nt, db_tile, Vp_l.shape[-1]),
                    C_l.reshape(nt, db_tile),
                    T_l.reshape(nt, db_tile),
                    dn_l.reshape(nt, db_tile),
                )
                scores, gpos = common.scan_database(
                    tiles, qb, sn_, kprime, db_tile,
                    id_offset=offset,
                    precision=self.precision,
                    strategy=self.topk_strategy,
                    compute_dtype=self.compute_dtype,
                    oid_tiles=oid_l.reshape(nt, db_tile),
                )
            # Exact slab-local refinement, then view position → original id
            # ON THE OWNING SHARD (shards own disjoint rows, so merged ids
            # stay unique and no cross-shard row gather ever happens).
            valid = jnp.isfinite(scores)
            lpos = jnp.clip(gpos - offset, 0, local_n - 1)
            rows = jnp.take(Vp_l, lpos, axis=0)
            exact = jnp.where(valid, exact_distances(qb.qV, rows), jnp.inf)
            oids = jnp.take(oid_l, lpos).astype(jnp.int32)
            if exact.shape[1] > kprime:
                # repair widened the candidate set: pre-select the local
                # exact top-k' so the ICI all-gather stays k'-wide
                top_neg, tidx = jax.lax.top_k(-exact, kprime)
                exact = -top_neg
                oids = jnp.take_along_axis(oids, tidx, axis=1)
            m_d, m_i = allgather_topk_merge(exact, oids, kprime, axis_name="d")
            cert = tuple(
                jax.lax.pmin(c, axis_name="d")
                for c in (cert_bin, cert_l2, cert_kc)
            )
            return (m_d, m_i) + cert

        merged_d, merged_ids, cb, cl2, ckc = _shard_map(
            local_scan,
            mesh=self.mesh,
            in_specs=(
                P("d", None), P("d", None), P("d"), P("d"), P("d"), P("d"),
                P(), P(), P(), P(), P(), P(),
                P(), P(),
            ),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )(Vp_view, Vs_view, C_view, T_view, dn_view, oid_view,
          qV, active_c, vv, active_t, ll, rr, sn, n)

        qb_g = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        f_ids, f_d = common.finalize_with_tail(
            merged_d, merged_ids, tail_V, qb_g, n, k
        )
        if self.certified and impl in ("xla_packed", "pallas_v3"):
            # Same construction as PartitionedEngine._search_full; each
            # term was pmin-reduced over "d" so one replicated scalar per
            # query certifies the whole sharded scan.
            t = f_d[:, k - 1]
            qnorm = jnp.sum(qV.astype(jnp.float32) ** 2, axis=1)
            thr = t + (
                self._rel_mm * (qnorm + self._dn_max)
                + _CERT_REL_T * t
                + _CERT_ABS
            )
            suspect = common.cert_suspect(
                cb < thr, cl2 < thr, ckc < thr, self._cert_debug
            )
        else:
            suspect = jnp.zeros((B,), bool)
        return f_ids, f_d, suspect

    def _search_full(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
        bin_top: int | None = None,
        level2: bool = True,
        row0=None,
        ntw: int | None = None,
    ):
        assert row0 is None and ntw is None, "window path disabled on mesh"
        bin_top = self.bin_top if bin_top is None else bin_top
        if bin_top is None:
            impl = "xla"
        elif self.scan_impl == "pallas_v3":
            impl = "pallas_v3"
        else:
            impl = "xla_packed"
        f_ids, f_d, suspect = self._sharded_scan(
            Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
            qV, qtype, v, l, r, sn, n, k, bin_top, level2, impl,
        )
        return bundle_ids(f_ids.astype(jnp.int32), suspect, self._id_mode), f_d

    def _search_stream(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        """Escalation-ladder last rung: per-shard streaming top-k' scan
        (certified by construction) + ICI merge."""
        f_ids, f_d, _ = self._sharded_scan(
            Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
            qV, qtype, v, l, r, sn, n, k, None, False, "xla",
        )
        return f_ids, f_d

    def _search_routed(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        g_start,                 # (NG,) int32 — NG = n_d · NG_l, shard-major
        starts, ends,            # (NG, G) int32 spans (global view positions)
        qV, qtype, v, l, r,      # (NG·G, ...) flattened slot query batch
        sn, n,
        k: int,
        span_cap: int,
    ):
        """Grouped-window scan, groups sharded over "d" — zero collectives.

        The host homes every group to the shard whose slab contains its
        window (``_enqueue_routed``), so each device scans only its own
        NG_l windows against local rows and finalizes its queries locally
        (the tail block is replicated). Span comparisons use GLOBAL view
        positions; gathers use slab-local ones.
        """
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        NG, G = starts.shape
        d = Vp_view.shape[1]
        kp = min(self.kprime, span_cap)
        precision = self.precision

        def local_routed(Vp_l, C_l, T_l, dn_l, oid_l, tail_l,
                         gs_l, st_l, en_l,
                         qV_l, ac_l, vv_l, at_l, ll_l, rr_l, sn_, n_):
            local_n = Vp_l.shape[0]
            offset = jax.lax.axis_index("d") * local_n
            NG_l = gs_l.shape[0]
            lane = jax.lax.broadcasted_iota(jnp.int32, (span_cap,), 0)

            def step(_, xs):
                gs, st, en, qv, ac, vq, at, lq, rq = xs
                gs_c = jnp.clip(gs - offset, 0, local_n - span_cap)
                rows = jax.lax.dynamic_slice(
                    Vp_l, (gs_c, 0), (span_cap, d)
                )
                Cr = jax.lax.dynamic_slice(C_l, (gs_c,), (span_cap,))
                Tr = jax.lax.dynamic_slice(T_l, (gs_c,), (span_cap,))
                dnr = jax.lax.dynamic_slice(dn_l, (gs_c,), (span_cap,))
                oidr = jax.lax.dynamic_slice(oid_l, (gs_c,), (span_cap,))
                qd = jax.lax.dot_general(
                    qv, rows.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )                                        # (G, span_cap)
                scores = dnr[None, :] - 2.0 * qd
                pos_g = gs_c + offset + lane             # global positions
                ok = (
                    (pos_g[None, :] >= st[:, None])
                    & (pos_g[None, :] < en[:, None])
                    & (oidr < sn_)[None, :]
                )
                ok &= jnp.logical_or(
                    ~ac[:, None], Cr[None, :] == vq[:, None]
                )
                ok &= jnp.logical_or(
                    ~at[:, None],
                    (Tr[None, :] >= lq[:, None])
                    & (Tr[None, :] <= rq[:, None]),
                )
                scores = jnp.where(ok, scores, jnp.inf)
                top_neg, idx = jax.lax.top_k(-scores, kp)
                # LOCAL positions: the finalize gather stays on-slab
                return None, (-top_neg, (gs_c + lane)[idx].astype(jnp.int32))

            _, (scores, pos_l) = jax.lax.scan(
                step,
                None,
                (
                    gs_l, st_l, en_l,
                    qV_l.reshape(NG_l, G, d),
                    ac_l.reshape(NG_l, G), vv_l.reshape(NG_l, G),
                    at_l.reshape(NG_l, G),
                    ll_l.reshape(NG_l, G), rr_l.reshape(NG_l, G),
                ),
            )
            qb_l = common.QueryBatch(qV_l, ac_l, vv_l, at_l, ll_l, rr_l)
            ids_v, d_v = common.finalize_view(
                scores.reshape(NG_l * G, kp), pos_l.reshape(NG_l * G, kp),
                Vp_l, oid_l, tail_l, qb_l, n_, k,
            )
            return (
                bundle_ids(
                    ids_v.astype(jnp.int32),
                    jnp.zeros((NG_l * G,), bool),
                    self._id_mode,
                ),
                d_v,
            )

        return _shard_map(
            local_routed,
            mesh=self.mesh,
            in_specs=(
                P("d", None), P("d"), P("d"), P("d"), P("d"), P(),
                P("d"), P("d", None), P("d", None),
                P("d", None), P("d"), P("d"), P("d"), P("d"), P("d"),
                P(), P(),
            ),
            out_specs=(P("d", None), P("d", None)),
            check_vma=False,
        )(Vp_view, C_view, T_view, dn_view, oid_view, tail_V,
          g_start, starts, ends,
          qV, active_c, vv, active_t, ll, rr, sn, n)

    # --- host driver ---------------------------------------------------------
    def _enqueue_routed(self, q_idx, start, end, qs, varg, scalars, k,
                        pending):
        """Shard-aware routed packing: per-slab group queues, drained
        round-robin so every dispatch carries an equal group count per
        shard (the mesh scans n_d windows concurrently)."""
        ln = self._local_n
        slab = start[q_idx] // ln
        by_cap: dict[int, list[list]] = {}
        for sh in np.unique(slab):
            sub = q_idx[slab == sh]
            for cap, glist in self._pack_groups(start, end, sub).items():
                by_cap.setdefault(cap, [[] for _ in range(self.n_d)])[
                    int(sh)
                ].extend(glist)
        G = self.route_group
        per = max(1, self.routed_groups // self.n_d)
        for cap in sorted(by_cap):
            queues = by_cap[cap]
            while any(queues):
                takes = [q[:per] for q in queues]
                queues = [q[per:] for q in queues]
                ml = max(len(t) for t in takes)
                NG_l = 1 << (ml - 1).bit_length() if ml > 1 else 1
                NG = self.n_d * NG_l
                g_start = np.zeros(NG, np.int32)
                st = np.zeros((NG, G), np.int32)
                en = np.zeros((NG, G), np.int32)
                slots = np.full(NG * G, -1, np.int64)
                for sh, tk in enumerate(takes):
                    # pad groups: an empty window inside the shard's own
                    # slab (spans stay 0 → all-inf → pad ids, slot -1)
                    g_start[sh * NG_l : (sh + 1) * NG_l] = sh * ln
                    for gi, (gs, members) in enumerate(tk):
                        row = sh * NG_l + gi
                        g_start[row] = gs
                        for qi, q in enumerate(members):
                            st[row, qi] = start[q]
                            en[row, qi] = end[q]
                            slots[row * G + qi] = q
                a = self._slot_query_args(slots, qs)
                out = self._jit_routed(
                    *varg,
                    jnp.asarray(g_start), jnp.asarray(st), jnp.asarray(en),
                    *map(jnp.asarray, a), *scalars,
                    k=k, span_cap=cap,
                )
                pending.append((slots, out, None, False))
