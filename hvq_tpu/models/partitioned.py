"""Partitioned exact engine — per-query routed scans over sorted views.

The reference scans ALL sn rows for every query and discards predicate
failures one branch at a time (optimized.hpp:84-117). This engine instead
resolves each query's predicate to a contiguous row range of a sorted view
by host-side binary search (index.partition) and routes by range width:

  narrow range  → ROUTED path: queries sorted by range start are packed
                  into GROUPS of ≤ ``route_group`` sharing one contiguous
                  window (≤ a bucket cap); a ``lax.scan`` over the groups
                  ``dynamic_slice``s each window once and scores all of its
                  queries with ONE ``(G, 128) · (128, cap)`` MXU matmul +
                  per-query predicate masks + one batched top-k. Work is
                  proportional to each query's selectivity — a type-1 query
                  over 1000 categories touches ~0.1 % of the database
                  instead of 100 % — and the per-scan-step fixed cost
                  (measured ~50 µs, the round-1 routed path's bottleneck at
                  52 µs/query) amortizes over the group. Same-category
                  type-1 queries have IDENTICAL windows, so they and the
                  type-3 queries nested inside the partition pack into
                  per-partition groups.
  wide range    → batched deferred full scan (the dense-MXU path); pruning
                  cannot beat a batched dense scan once most rows qualify.
                  WIDE TYPE-2 ranges get a middle path: on the T-sorted
                  view a start-sorted batch's candidates all live in the
                  tile window [min start, max end), so the same certified
                  packed scan runs over a dynamic window of the view
                  (power-of-two tile-count buckets ≤ nt/2) — typically
                  30–50 % less scan work than the full database.

A per-BATCH tile union (the earlier design) is wrong for batched workloads:
256 random categories union to more tiles than the database has — measured
656 QPS vs the dense engine's ~8000. Per-query slices sidestep the union;
per-group windows keep the slice count sublinear in queries.

Query → view mapping (index.partition.query_ranges):
  type 0          → cat_view, full range          (always the full path)
  type 1 (C==v)   → cat_view, the category partition
  type 3          → cat_view, partition ∩ T-range (binary search, exact)
  type 2 (l≤T≤r)  → time_view, one global T range

Span buckets are powers-of-two-ish caps so jit specializations stay
bounded; results carry original ids throughout (sample-proportion tests
ORIGINAL ids — reference optimized.hpp:85 — and padding semantics are
identical to the other engines).

Full-path exactness mirrors BatchedEngine: packed bin scan + certificate
+ IN-PROGRAM bin repair (common.bin_repair_candidates — benign Poisson
bin collisions, ~6 % of full-path queries at D=10⁷/R=2 and measured as
100 % of the round-2 suspect mass via HVQ_CERT_TERMS forensics, are
exact-refined inside the search program instead of paying a ~200 ms
full-view rescan each through the ladder). The ladder remains for
adversarial layouts wider than ``repair_bins``, with pow-2-compacted
rerun batch shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.models.batched import (
    _pow2_batch,
    bundle_ids,
    id_pack_mode,
    unbundle_ids,
)
from hvq_tpu.index.partition import PartitionedIndex
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import pad_vectors_np, resolve_precision
from hvq_tpu.utils.formats import Dataset, QuerySet


class PartitionedEngine:
    """Exact engine with per-query category/timestamp range routing."""

    name = "partitioned"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int | None = None,
        query_batch: int = 1024,
        kprime: int | None = None,
        dtype=jnp.float32,
        scan_store: str = "fp32",
        precision: str = "high",
        topk_strategy: str = "topk",
        scan_impl: str = "auto",
        index: PartitionedIndex | None = None,
        # Measured policy (experiments/route_buckets.py, medium set): a
        # routed slice reads cap·512 B of HBM per QUERY, while the dense
        # path amortizes the whole DB over the batch (~0.5 MB/query at
        # B=1024) — a 262144 cap costs 128 MB/query and sinks the mixed
        # workload 3347 → 8557 QPS when dropped. Caps stay ≲ 32k.
        route_buckets: tuple[int, ...] = (4096, 32768),
        route_group: int = 16,
        routed_batch: int | None = None,
        dispatch_group: int = 8,
        certified: bool = True,
        bin_top: int | None = None,
        l2_min_w: int = 16384,
        scan_layout: str = "axis1",
        # In-program bin repair width: exact-refine the rb most-saturated
        # bins per query so benign Poisson collisions (≈6% of queries at
        # D=10⁷/R=2) stop triggering full-view rerun rescans; 0 disables
        # (common.bin_repair_candidates). Default 0: the repair gather +
        # widened refine taxes EVERY batch ~19 ms while the compacted
        # rerun ladder absorbs the suspects for ~4 ms/batch — measured
        # +42% at D=10⁶ and +5-13% at D=10⁷ (experiments/flagship_ab.py).
        repair_bins: int = 0,
        repair_gate: bool = False,
        # Economics gate for the LAZY time view (a second full database
        # copy in HBM + upload): only materialize once a single search
        # carries enough type-2 queries to amortize it, and never beyond
        # the byte budget. 4 GB default: at D=10⁷ a second 5.3 GB view
        # next to the scan workspace RESOURCE_EXHAUSTs the v5e chip
        # (measured twice, r2) — type-2 queries there ride the dense cat
        # view instead; at D≤2×10⁶ both views fit with headroom.
        time_view_min_queries: int = 4096,
        time_view_max_bytes: int = 4_000_000_000,
    ):
        # Full-path scan implementation: the v3 fused kernel (sublane-axis
        # bin rounds; measured +52% over xla_packed, CHANGELOG r3) on TPU,
        # its XLA twin elsewhere. Windowed (wide-type-2) scans ride the
        # same kernel via its scalar-prefetch row0/ntw window (r4).
        if scan_impl == "auto":
            scan_impl = (
                "pallas_v3"
                if jax.devices()[0].platform == "tpu"
                else "xla_packed"
            )
        if db_tile is None:
            db_tile = 16384 if scan_impl == "pallas_v3" else 8192
        elif (
            scan_impl == "pallas_v3"
            and (db_tile // 128) % 128
            and jax.devices()[0].platform == "tpu"
        ):
            scan_impl = "xla_packed"      # tile too small for the v3 reshape
        self.scan_impl = scan_impl
        self._interpret = jax.devices()[0].platform != "tpu"
        self.index = index or PartitionedIndex.build(
            ds, db_tile=db_tile, dtype=dtype, scan_store=scan_store
        )
        # A provided index decides the scan plane itself (batched policy).
        self._bf16_scan = self.index.cat_view.V_scan is not None
        if kprime is None:
            # bf16 plane: wider k' keeps the k'-cut boundary clear of the
            # widened certificate envelope; 240 not 256 — the selection
            # stage pays a measured cliff at k'=256 (see models/batched.py)
            kprime = 240 if self._bf16_scan else 128
        from hvq_tpu.models.batched import _CERT_REL_MM, _CERT_REL_MM_BF16

        self._rel_mm = (
            _CERT_REL_MM_BF16 if self._bf16_scan else _CERT_REL_MM
        )
        if self.scan_impl == "pallas_v3":
            if (self.index.cat_view.db_tile // 128) % 128 and not self._interpret:
                # the ACTUAL scan tiles come from the index — a prebuilt
                # index with small tiles would hit the v3 kernel's
                # ValueError at the first full-path search (ADVICE r3)
                self.scan_impl = "xla_packed"
            else:
                # the v3 kernel always emits the axis1 layout (sublane
                # rounds, pos = tile·Dt + slice·bins + bin): level-2 and
                # repair decoding must match it (ADVICE r3, medium)
                scan_layout = "axis1"
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=kprime))
        self.query_batch = query_batch
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        # bf16 scan plane: one true MXU pass; the precision knob only
        # decomposes fp32 operands (batched policy).
        self._scan_precision = (
            jax.lax.Precision.DEFAULT if self._bf16_scan else self.precision
        )
        self.topk_strategy = topk_strategy
        self.compute_dtype = dtype
        # Same gate as BatchedEngine: the certificate's error model assumes
        # ≥3-pass matmul selection on fp32 storage — or the bf16 scan
        # plane's own widened envelope (refinement stays fp32 either way).
        self.certified = bool(
            certified
            and dtype == jnp.float32
            and (
                self._bf16_scan
                or self.precision
                in (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST)
            )
        )
        n_pad = self.index.cat_view.n_pad
        # Snug extra bucket for whole-partition (type-1) windows: the max
        # category run length in the (C, T)-sorted view, rounded up. Without
        # it a 10⁴-row partition rides the next power-of-two-ish cap — up to
        # 3× the HBM read and top-k width per query. (+128 margin: group
        # window starts are aligned DOWN to the lane multiple.)
        ck = self.index.cat_view.C_key
        if ck.size > 1:
            bnd = np.flatnonzero(ck[1:] != ck[:-1]) + 1
            wmax = int(np.diff(np.r_[0, bnd, ck.size]).max())
        else:
            wmax = int(ck.size)
        cap_part = -(-(wmax + 128) // 512) * 512
        buckets = set(route_buckets)
        # Only ever INSERT an intermediate cap — the largest route_bucket
        # still defines which spans are routable at all.
        if buckets and kprime <= cap_part < max(buckets) and not any(
            cap_part <= c < 2 * cap_part for c in buckets
        ):
            buckets.add(cap_part)
        # Bucketed span caps (≥ kprime so the routed top-k is well-formed,
        # ≤ n_pad so the dynamic slice fits), ascending, deduplicated.
        caps = sorted({min(max(b, kprime), n_pad) for b in buckets})
        # Wide ranges use the deferred packed full scan — same algorithm as
        # BatchedEngine's default, including its exactness certificate +
        # compacted escalation. Bin collisions stay random because vectors
        # are independent of the (C, T) sort order.
        from hvq_tpu.ops.pallas_scan import choose_bin_top

        self.bin_top = (
            bin_top
            if bin_top is not None
            else choose_bin_top(n_pad, kprime, certified=self.certified)
        )
        if self.bin_top is None and (not caps or caps[-1] < n_pad):
            # tiny DB: the deferred full scan has no sound bin depth, so
            # EVERY query routes — there must be a bucket covering any span
            caps.append(n_pad)
        self.route_buckets = tuple(c for c in caps if c >= kprime)
        # Subclass seams (ShardedPartitionedEngine): whether tiny-DB
        # queries are all forced onto the routed path, and whether the
        # wide-type-2 window path is available at all.
        self._route_all_fallback = self.bin_top is None
        self._enable_window = True
        self._dn_max = (
            float(jnp.max(self.index.cat_view.d_norms))
            if self.certified
            else 0.0
        )
        # Routed scans cost ~µs per query: pack many into one dispatch so
        # the fixed host/relay round trip amortizes. Queries are packed
        # route_group per shared window; a dispatch carries
        # routed_batch/route_group groups.
        self.route_group = max(1, int(route_group))
        self.routed_batch = routed_batch or 4 * query_batch
        self.routed_groups = max(1, self.routed_batch // self.route_group)
        # see BatchedEngine.l2_min_w (constructor-only: baked into the
        # traced program at first compile)
        self.l2_min_w = l2_min_w
        self.scan_layout = scan_layout
        self.repair_bins = int(repair_bins)
        self.repair_gate = bool(repair_gate)
        self.dispatch_group = dispatch_group
        self.time_view_min_queries = time_view_min_queries
        self.time_view_max_bytes = time_view_max_bytes
        # 16/24-bit id packing for every result fetch (relay bandwidth is
        # ~40 MB/s; see batched.bundle_ids). Gated on n_pad: every id that
        # can reach a bundle is an original id < n or a tail pad < n.
        self._id_mode = id_pack_mode(n_pad, _c.K_DEFAULT)
        # Certificate forensics (HVQ_CERT_TERMS=1 before construction):
        # the bundled suspect column becomes a term bitmask (1 = bin
        # saturation, 2 = level-2 saturation, 4 = k'-cut) and search()
        # records it per query in ``_last_cert_terms`` — nonzero still
        # means suspect, so the rerun ladder is unaffected.
        import os as _os

        self._cert_debug = _os.environ.get("HVQ_CERT_TERMS") == "1"
        self._last_cert_terms: np.ndarray | None = None
        self._jit_full = jax.jit(
            self._search_full, static_argnames=("k", "bin_top", "level2")
        )
        self._jit_full_group = jax.jit(
            self._search_full_group,
            static_argnames=("k", "bin_top", "level2"),
        )
        self._jit_routed = jax.jit(
            self._search_routed, static_argnames=("k", "span_cap")
        )
        self._jit_stream = jax.jit(
            self._search_stream, static_argnames=("k",)
        )
        self._jit_window = jax.jit(
            self._search_full_window, static_argnames=("k", "ntw")
        )
        self._jit_window_group = jax.jit(
            self._search_full_window_group, static_argnames=("k", "ntw")
        )

    # --- jitted cores ------------------------------------------------------
    def _search_routed(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view,  # flat view
        tail_V,       # arrays; Vs_view = scan plane (unused on this path)
        g_start,                 # (NG,) int32 shared window starts (aligned)
        starts, ends,            # (NG, G) int32 candidate spans per query
        qV, qtype, v, l, r,      # (NG*G, ...) flattened query batch
        sn, n,
        k: int,
        span_cap: int,
    ):
        """Grouped contiguous-window scan: work ∝ selectivity, steps ∝ groups.

        Each scan step slices ONE shared [g_start, g_start+span_cap) window
        and scores all G of its queries with a single (G, d)·(d, cap) MXU
        matmul — the per-step fixed cost (the round-1 per-query GEMV path's
        bottleneck, ~50 µs/step) amortizes over the group. Every row of a
        query's [start, end) satisfies its predicate by construction (the
        index range is exact), so the in-window mask only re-checks the
        range bounds, the sample-proportion limit over ORIGINAL ids, and
        (cheaply, for robustness) the predicate itself. Pad query slots
        carry start == end == 0 → all-inf rows → pad ids from finalize.
        """
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        n_pad, d = Vp_view.shape
        NG, G = starts.shape
        kp = min(self.kprime, span_cap)
        lane = jax.lax.broadcasted_iota(jnp.int32, (span_cap,), 0)
        precision = self.precision

        def step(_, xs):
            gs, st, en, qv, ac, vq, at, lq, rq = xs
            gs_c = jnp.clip(gs, 0, n_pad - span_cap)
            rows = jax.lax.dynamic_slice(Vp_view, (gs_c, 0), (span_cap, d))
            Cr = jax.lax.dynamic_slice(C_view, (gs_c,), (span_cap,))
            Tr = jax.lax.dynamic_slice(T_view, (gs_c,), (span_cap,))
            dnr = jax.lax.dynamic_slice(dn_view, (gs_c,), (span_cap,))
            oidr = jax.lax.dynamic_slice(oid_view, (gs_c,), (span_cap,))
            qd = jax.lax.dot_general(
                qv, rows.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )                                            # (G, span_cap)
            scores = dnr[None, :] - 2.0 * qd
            pos = gs_c + lane                            # (span_cap,)
            ok = (
                (pos[None, :] >= st[:, None])
                & (pos[None, :] < en[:, None])
                & (oidr < sn)[None, :]
            )
            ok &= jnp.logical_or(~ac[:, None], Cr[None, :] == vq[:, None])
            ok &= jnp.logical_or(
                ~at[:, None],
                (Tr[None, :] >= lq[:, None]) & (Tr[None, :] <= rq[:, None]),
            )
            scores = jnp.where(ok, scores, jnp.inf)
            top_neg, idx = jax.lax.top_k(-scores, kp)    # (G, kp)
            return None, (-top_neg, pos[idx].astype(jnp.int32))

        _, (scores, pos) = jax.lax.scan(
            step,
            None,
            (
                g_start,
                starts, ends,
                qV.reshape(NG, G, d),
                active_c.reshape(NG, G), vv.reshape(NG, G),
                active_t.reshape(NG, G),
                ll.reshape(NG, G), rr.reshape(NG, G),
            ),
        )
        ids_v, d_v = common.finalize_view(
            scores.reshape(NG * G, kp), pos.reshape(NG * G, kp),
            Vp_view, oid_view, tail_V, qb, n, k
        )
        # routed results are exact by construction (no certificate bit to
        # carry) but share the packed-id fetch format with the full path
        return (
            bundle_ids(
                ids_v.astype(jnp.int32),
                jnp.zeros((NG * G,), bool),
                self._id_mode,
            ),
            d_v,
        )

    def _search_full(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view,
        tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
        bin_top: int | None = None,
        level2: bool = True,
        row0=None,
        ntw: int | None = None,
    ):
        from hvq_tpu.models.batched import (
            _CERT_ABS,
            _CERT_REL_MM,
            _CERT_REL_T,
        )
        from hvq_tpu.ops.pallas_scan import (
            BIN,
            deferred_packed_scan_xla,
            last_round_dists,
        )

        bin_top = self.bin_top if bin_top is None else bin_top
        db_tile = self.index.cat_view.db_tile
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        # Packed-key deferred scan (the dense engine's default): the sn mask
        # tests ORIGINAL ids via oid_view; the returned payload is the VIEW
        # POSITION so refinement gathers stay local to the view. Both full
        # AND windowed (dynamic row0) scans take the fused v3 kernel when
        # selected — the window offset rides the kernel's scalar-prefetch
        # index maps (VERDICT r3 #3).
        if self.scan_impl == "pallas_v3":
            from hvq_tpu.ops.pallas_scan import (
                fused_packed_scan_v3,
                v3_query_block,
            )

            out_s, out_i = fused_packed_scan_v3(
                Vs_view, C_view, T_view, dn_view, oid_view,
                qb.qV, qb.active_c, qb.v, qb.active_t, qb.l, qb.r, sn,
                db_tile=db_tile, bin_top=bin_top,
                b_block=v3_query_block(qV.shape[0], 256),
                interpret=self._interpret,
                row0=row0, ntw=ntw,
            )
        else:
            out_s, out_i = deferred_packed_scan_xla(
                Vs_view, C_view, T_view, dn_view, oid_view,
                qb.qV, qb.active_c, qb.v, qb.active_t, qb.l, qb.r, sn,
                db_tile=db_tile, bin_top=bin_top,
                precision=self._scan_precision,
                layout=self.scan_layout,
                row0=row0, ntw=ntw,
            )
        W = out_s.shape[1]
        kp = min(self.kprime, W)
        nt_v = (
            ntw if row0 is not None and ntw is not None
            else Vp_view.shape[0] // db_tile
        )
        worst2 = None
        # level-2 gates: see BatchedEngine (axis1 needs bins2 >= 128,
        # lane needs nt >= 128)
        l2_ok = (
            W >= 16384 if self.scan_layout == "axis1" else nt_v >= 128
        )
        if level2 and W >= self.l2_min_w and l2_ok:
            from hvq_tpu.ops.topk import binned_stream_topk

            scores, cand_pos, worst2 = binned_stream_topk(
                out_s, out_i, kp, nt=nt_v, layout=self.scan_layout
            )
        else:
            top_neg, idx = jax.lax.top_k(-out_s, kp)
            scores = -top_neg
            cand_pos = jnp.take_along_axis(out_i, idx, axis=1)
        # k'-cut boundary estimate BEFORE repair widens the candidate set
        kcut_score = scores[:, kp - 1] if kp < W else None
        remaining_min = None
        if self.certified and self.repair_bins:
            # in-program bin repair: exact-refine the rb worst bins' rows
            # instead of paying the rerun ladder's full-view rescan for
            # benign Poisson collisions (common.bin_repair_candidates).
            # thr_pre: provisional threshold from the k-th candidate
            # ESTIMATE + doubled slack — provably ≥ the final threshold,
            # gates the scattered-row gather to actually-saturated bins
            thr_pre = (
                common.repair_thr_pre(
                    scores, k, qV, self._dn_max,
                    self._rel_mm, _CERT_REL_T, _CERT_ABS,
                )
                if self.repair_gate
                else None
            )
            scores, cand_pos, remaining_min = common.bin_repair_candidates(
                out_s, scores, cand_pos, nt_v, bin_top, db_tile // BIN,
                db_tile, self.scan_layout, C_view, T_view, oid_view,
                qb, sn, self.repair_bins, row0=row0, thr_pre=thr_pre,
            )
        f_ids, f_d = common.finalize_view(
            scores, cand_pos, Vp_view, oid_view, tail_V, qb, n, k
        )
        if self.certified:
            # Same construction as BatchedEngine (models/batched.py
            # docstring): per-bin saturation minima + the k'-cut boundary
            # vs the k-th final distance plus fp slack.
            t = f_d[:, k - 1]
            qnorm = jnp.sum(qV.astype(jnp.float32) ** 2, axis=1)
            thr = t + (
                self._rel_mm * (qnorm + self._dn_max)
                + _CERT_REL_T * t
                + _CERT_ABS
            )
            t_bin = (
                remaining_min
                if remaining_min is not None
                else jnp.min(
                    last_round_dists(out_s, nt_v, bin_top, db_tile // BIN),
                    axis=1,
                )
            ) < thr
            t_l2 = (worst2 < thr) if worst2 is not None else None
            t_kcut = (kcut_score < thr) if kcut_score is not None else None
            suspect = common.cert_suspect(
                t_bin, t_l2, t_kcut, self._cert_debug
            )
        else:
            suspect = jnp.zeros((qV.shape[0],), bool)
        # [packed ids | certificate bit] as ONE fetched int32 tensor — a
        # separate suspect fetch would cost ~27 ms of relay latency per
        # dispatch, and unpacked ids 1.33–2× the fetch bytes
        return bundle_ids(f_ids.astype(jnp.int32), suspect, self._id_mode), f_d

    def _search_stream(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view,
        tail_V,
        qV, qtype, v, l, r,
        sn, n,
        k: int,
    ):
        """Certified-by-construction streaming top-k' scan over the view —
        the escalation ladder's last rung (no bin reduce to saturate)."""
        db_tile = self.index.cat_view.db_tile
        nt = Vp_view.shape[0] // db_tile
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        tiles = (
            Vp_view.reshape(nt, db_tile, Vp_view.shape[-1]),
            C_view.reshape(nt, db_tile),
            T_view.reshape(nt, db_tile),
            dn_view.reshape(nt, db_tile),
        )
        scores, pos = common.scan_database(
            tiles, qb, sn, self.kprime, db_tile,
            precision=self.precision,
            strategy=self.topk_strategy,
            compute_dtype=self.compute_dtype,
            oid_tiles=oid_view.reshape(nt, db_tile),
        )
        return common.finalize_view(
            scores, pos, Vp_view, oid_view, tail_V, qb, n, k
        )

    def _search_full_window(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        row0,                     # () int32 window start row (tile-aligned)
        qV, qtype, v, l, r,
        sn, n,
        k: int,
        ntw: int,                 # static window tile count
    ):
        """The certified deferred full scan over a dynamic tile WINDOW of a
        sorted view. On the T-sorted view every candidate row of a wide
        type-2 batch lies in [min start, max end) — tiles outside provably
        fail every query's T predicate, so scanning only the window keeps
        the result exact and the certificate's coverage argument intact
        (selection error among scanned rows is what it bounds; unscanned
        rows are predicate-failures). The scan dynamic-slices one TILE per
        step from the resident view (no window copy: the 10⁷ set already
        holds two 5.3 GB views in HBM) and returns global positions."""
        return self._search_full(
            Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
            qV, qtype, v, l, r, sn, n, k, row0=row0, ntw=ntw,
        )

    def _search_full_window_group(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        row0g,                            # (G,) int32 window starts
        qVg, qtypeg, vg, lg, rg,          # (G, B, ...) stacked batches
        sn, n,
        k: int,
        ntw: int,
    ):
        """G windowed batches in ONE dispatch (fixed-cost amortization)."""

        def step(_, xs):
            row0, qV, qtype, v, l, r = xs
            return None, self._search_full_window(
                Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
                row0, qV, qtype, v, l, r, sn, n, k, ntw,
            )

        _, out = jax.lax.scan(step, None, (row0g, qVg, qtypeg, vg, lg, rg))
        return out

    def _search_full_group(
        self,
        Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
        qVg, qtypeg, vg, lg, rg,          # (G, B, ...) stacked batches
        sn, n,
        k: int,
        bin_top: int | None = None,
        level2: bool = True,
    ):
        """G full-scan batches in ONE dispatch (fixed-cost amortization)."""

        def step(_, xs):
            qV, qtype, v, l, r = xs
            return None, self._search_full(
                Vp_view, Vs_view, C_view, T_view, dn_view, oid_view, tail_V,
                qV, qtype, v, l, r, sn, n, k, bin_top, level2,
            )

        _, out = jax.lax.scan(step, None, (qVg, qtypeg, vg, lg, rg))
        return out

    # --- host driver -----------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
        return_dists: bool = True,
        phases=None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        from hvq_tpu.utils.timing import maybe_phase

        idx = self.index
        n = idx.cat_view.n
        sn_val = int(sample_proportion * n)
        with maybe_phase(phases, "search/route"):
            view_id, start, end = idx.query_ranges(
                qs.qtype, qs.v, qs.l, qs.r
            )
        span = end - start

        ids_out = np.empty((qs.m, k), dtype=np.uint32)
        dists_out = (
            np.empty((qs.m, k), dtype=np.float32) if return_dists else None
        )

        # Routable = the span fits the widest bucket; full-range queries
        # (type 0 and degenerate single-partition cases) always take the
        # batched dense path. Cap assignment happens per GROUP at pack time.
        routable = np.zeros(qs.m, bool)
        if self.route_buckets:
            routable = (span <= self.route_buckets[-1]) & (span < n)
            routable &= self._routable_extra(start, end)
        # Time-view economics: narrow type-2 queries are the ONLY users of
        # the lazy T-sorted copy. If it isn't materialized yet and this
        # call doesn't justify it (too few such queries, or the copy blows
        # the HBM budget), send them down the dense path instead — exact
        # either way, no 2nd database upload.
        t2 = (view_id == 1) & routable
        if self.index._time_view is None and t2.any():
            view_bytes = self.index.cat_view.n_pad * (_c.PADDED_DIM + 4) * 4
            if (
                int(t2.sum()) < self.time_view_min_queries
                or view_bytes > self.time_view_max_bytes
            ):
                view_id = np.where(t2, 0, view_id)
                routable &= ~t2
        if self._route_all_fallback:
            # no sound bin depth for the deferred full scan on tiny DBs:
            # route everything through the cat view's full-coverage bucket
            # with a full range — the routed kernel's predicate mask does
            # the filtering (ranges are view-specific, so rerouting a
            # type-2 query off the time view must widen its range).
            forced = ~routable
            if forced.any():
                view_id = np.where(forced, 0, view_id)
                start = np.where(forced, 0, start)
                end = np.where(forced, n, end)
                routable[:] = True
        # Full scans mask predicates anyway — the view only matters for
        # pruning. Funnel ALL wide queries through cat_view so they share
        # one grouped dispatch stream instead of splitting per view.
        view_id = np.where(~routable, 0, view_id)

        # WIDE TYPE-2 middle path: on the T-sorted view a start-sorted
        # batch's candidates all live in tiles [min start, max end) — run
        # the same certified scan over just that window when it is ≤ nt/2
        # tiles (power-of-two-ish buckets bound jit specializations).
        # Partial batches and window-doesn't-help batches stay dense.
        windowed = np.zeros(qs.m, bool)
        win_batches: list[tuple[int, int, np.ndarray]] = []
        wide_t2 = (qs.qtype == 2) & ~routable
        if self._enable_window and self.bin_top is not None and wide_t2.any():
            cv = idx.cat_view
            nt = cv.num_tiles
            Dt = cv.db_tile
            wcount = int(wide_t2.sum())
            view_bytes = cv.n_pad * (_c.PADDED_DIM + 4) * 4
            tv_ok = view_bytes <= self.time_view_max_bytes and (
                idx._time_view is not None
                or wcount >= self.time_view_min_queries
            )
            if tv_ok and nt >= 8 and wcount >= self.query_batch:
                buckets_w = sorted({nt // 8, nt // 4, nt // 2})
                w_idx = np.nonzero(wide_t2)[0]
                order = w_idx[np.argsort(start[w_idx], kind="stable")]
                B = self.query_batch
                for s in range(0, order.size - B + 1, B):
                    chunk = order[s : s + B]
                    t0 = int(start[chunk[0]]) // Dt
                    t1 = -(-int(end[chunk].max()) // Dt)
                    need = max(1, t1 - t0)
                    ntw = next((b for b in buckets_w if b >= need), None)
                    if ntw is None:
                        continue                      # barely prunes: dense
                    row0 = min(t0 * Dt, cv.n_pad - ntw * Dt)
                    win_batches.append((row0, ntw, chunk))
                    windowed[chunk] = True

        # Enqueue every dispatch, fetch at the end (overlaps uploads with
        # device compute; see BatchedEngine.search). Full-scan batches are
        # additionally grouped into power-of-two multi-batch dispatches.
        from hvq_tpu.models.batched import dispatch_plan

        scalars = (jnp.int32(sn_val), jnp.int32(n))
        pending = []
        with maybe_phase(phases, "search/enqueue"):
            for vid in (0, 1):
                if not np.any(view_id == vid):
                    continue
                # idx.time_view is LAZY (a second full HBM copy): only narrow
                # type-2 queries ever reach vid == 1.
                view = self._get_view(vid)
                varg = (view.Vp, view.scan_V, view.C, view.T,
                        view.d_norms, view.oid, self.tail_V)
                # FULL route: batched dense packed scan, grouped dispatches
                q_idx = np.nonzero(
                    (view_id == vid) & ~routable & ~windowed
                )[0]
                if q_idx.size:
                    B = self.query_batch
                    nb = -(-q_idx.size // B)
                    s = 0
                    for G in dispatch_plan(nb, self.dispatch_group):
                        batch_list = [
                            q_idx[(s + g) * B : (s + g + 1) * B]
                            for g in range(G)
                        ]
                        if G > 1:
                            stk = [self._query_args(b, qs) for b in batch_list]
                            args = tuple(
                                jnp.asarray(np.stack([a[i] for a in stk]))
                                for i in range(5)
                            )
                            out = self._jit_full_group(
                                *varg, *args, *scalars, k=k
                            )
                            pending.append(
                                (np.concatenate(batch_list), out, B, True)
                            )
                        else:
                            a = self._query_args(batch_list[0], qs)
                            out = self._jit_full(
                                *varg, *map(jnp.asarray, a), *scalars, k=k
                            )
                            pending.append((batch_list[0], out, None, True))
                        s += G
                # ROUTED: pack sorted-by-start queries into shared windows,
                # dispatch routed_groups windows at a time per cap bucket
                q_idx = np.nonzero((view_id == vid) & routable)[0]
                if q_idx.size:
                    self._enqueue_routed(
                        q_idx, start, end, qs, varg, scalars, k, pending
                    )
            # WINDOWED wide type-2 batches on the T-sorted view, grouped
            # per tile-count bucket (first touch materializes the view —
            # the bench warmup pass pays that, not the timed region)
            if win_batches:
                tv = idx.time_view
                varg_t = (tv.Vp, tv.scan_V, tv.C, tv.T, tv.d_norms, tv.oid,
                          self.tail_V)
                by_ntw: dict[int, list] = {}
                for row0, ntw, chunk in win_batches:
                    by_ntw.setdefault(ntw, []).append((row0, chunk))
                for ntw in sorted(by_ntw):
                    blist = by_ntw[ntw]
                    s = 0
                    for G in dispatch_plan(len(blist), self.dispatch_group):
                        sub = blist[s : s + G]
                        if G > 1:
                            stk = [self._query_args(qi, qs) for _, qi in sub]
                            args = tuple(
                                jnp.asarray(np.stack([a[i] for a in stk]))
                                for i in range(5)
                            )
                            row0s = jnp.asarray(
                                np.array([r0 for r0, _ in sub], np.int32)
                            )
                            out = self._jit_window_group(
                                *varg_t, row0s, *args, *scalars, k=k, ntw=ntw
                            )
                            pending.append((
                                np.concatenate([qi for _, qi in sub]),
                                out, self.query_batch, True,
                            ))
                        else:
                            r0, qi = sub[0]
                            a = self._query_args(qi, qs)
                            out = self._jit_window(
                                *varg_t, jnp.int32(r0),
                                *map(jnp.asarray, a), *scalars,
                                k=k, ntw=ntw,
                            )
                            pending.append((qi, out, None, True))
                        s += G
        suspect_q = []
        if self._cert_debug:
            self._last_cert_terms = np.zeros(qs.m, np.int32)
        with maybe_phase(phases, "search/fetch"):
            common.prefetch_host(
                x for _, (ids_b, d_b), _, _ in pending
                for x in ((ids_b, d_b) if return_dists else (ids_b,))
            )
            for batch_idx, (ids_b, d_b), B_g, is_full in pending:
                arr = np.asarray(ids_b)
                arr = arr.reshape(-1, arr.shape[-1])
                if is_full:
                    # full-path bundles carry the certificate bit; batch
                    # padding is contiguous at the END
                    ids_np, sus_b = unbundle_ids(
                        arr[: batch_idx.size], k, self._id_mode
                    )
                    if self._cert_debug:
                        self._last_cert_terms[batch_idx] = arr[
                            : batch_idx.size, -1
                        ]
                    suspect_q.append(batch_idx[sus_b])
                    ids_out[batch_idx] = ids_np
                    if return_dists:
                        d_np = np.asarray(d_b).reshape(-1, k)
                        dists_out[batch_idx] = d_np[: batch_idx.size]
                else:
                    # routed slots: pad entries (-1) interleave per group
                    ids_np, _ = unbundle_ids(arr, k, self._id_mode)
                    valid = batch_idx >= 0
                    tgt = batch_idx[valid]
                    ids_out[tgt] = ids_np[valid]
                    if return_dists:
                        dists_out[tgt] = np.asarray(d_b).reshape(-1, k)[valid]
        if suspect_q:
            sus = np.concatenate(suspect_q)
            if sus.size:
                with maybe_phase(phases, "search/rerun"):
                    self._rerun_suspects(
                        sus, qs, ids_out, dists_out, scalars, k
                    )
        return ids_out, dists_out

    def _rerun_suspects(self, sus, qs, ids_out, dists_out, scalars, k):
        """BatchedEngine's ladder for the full-scan path: flagged queries
        compacted into fresh batches, re-run at 2R bin depth, then through
        the streaming top-k' scan (certified by construction). All full
        scans run on cat_view (search funnels wide queries there)."""
        from hvq_tpu.ops.pallas_scan import BIN

        view = self.index.cat_view
        varg = (view.Vp, view.scan_V, view.C, view.T, view.d_norms,
                view.oid, self.tail_V)
        deeper = (
            min(2 * self.bin_top, BIN) if self.bin_top is not None else None
        )
        if deeper is not None and deeper <= self.bin_top:
            deeper = None
        # Suspects are typically a handful per 40k queries, but the scan
        # cost at fixed W is dominated by per-step structure, not B —
        # compact each rung into the smallest pow-2 program shape (>=64)
        # instead of paying a full query_batch-shaped scan. The stream
        # rung then re-compacts to only the still-suspect queries.
        B = self.query_batch
        still_q = []
        if deeper is not None:
            for s in range(0, sus.size, B):
                sel = sus[s : s + B]
                Br = _pow2_batch(sel.size, B)
                a = self._query_args(sel, qs, B=Br)
                b_b, d_b = self._jit_full(
                    *varg, *map(jnp.asarray, a), *scalars,
                    k=k, bin_top=deeper, level2=False,
                )
                common.prefetch_host(
                    (b_b, d_b) if dists_out is not None else (b_b,)
                )
                b_np = np.asarray(b_b)[: sel.size]
                ids_np, sus_b = unbundle_ids(b_np, k, self._id_mode)
                fixed = ~sus_b
                ids_out[sel[fixed]] = ids_np[fixed]
                if dists_out is not None:
                    dists_out[sel[fixed]] = np.asarray(d_b)[: sel.size][
                        fixed
                    ]
                still_q.append(sel[sus_b])
        else:
            still_q.append(sus)
        sus2 = np.concatenate(still_q) if still_q else np.empty(0, sus.dtype)
        for s in range(0, sus2.size, B):
            sel = sus2[s : s + B]
            Br = _pow2_batch(sel.size, B)
            a = self._query_args(sel, qs, B=Br)
            ids_b, d_b = self._jit_stream(
                *varg, *map(jnp.asarray, a), *scalars, k=k
            )
            common.prefetch_host(
                (ids_b, d_b) if dists_out is not None else (ids_b,)
            )
            ids_out[sel] = np.asarray(ids_b)[: sel.size]
            if dists_out is not None:
                dists_out[sel] = np.asarray(d_b)[: sel.size]

    # --- subclass seams ----------------------------------------------------
    def _get_view(self, vid: int):
        """View for a dispatch stream (0 = cat, 1 = time). Subclasses place
        the arrays on their mesh here."""
        return self.index.cat_view if vid == 0 else self.index.time_view

    def _routable_extra(self, start, end):
        """Extra per-query routability constraint (bool mask). The sharded
        subclass rejects spans straddling a shard-slab boundary."""
        return np.ones(start.shape[0], bool)

    def _enqueue_routed(self, q_idx, start, end, qs, varg, scalars, k, pending):
        """Pack routable queries into grouped windows and enqueue dispatches.

        One seam so ShardedPartitionedEngine can substitute shard-aware
        packing (groups homed to the shard slab that owns their window).
        """
        by_cap = self._pack_groups(start, end, q_idx)
        for cap in sorted(by_cap):
            glist = by_cap[cap]
            for s in range(0, len(glist), self.routed_groups):
                chunk = glist[s : s + self.routed_groups]
                out, slots = self._routed_dispatch(
                    chunk, cap, qs, start, end, varg, scalars, k
                )
                pending.append((slots, out, None, False))

    def _pack_groups(self, start, end, q_idx):
        """Greedy shared-window packer over start-sorted routable queries.

        Walks queries in range-start order, extending the current group's
        window while it stays within the group's target cap and the group
        has fewer than route_group members; escalates to the next bucket
        only while the group is under half full (snug caps matter: the
        routed top-k and HBM read both scale with cap). Window starts are
        aligned DOWN to the 128-lane multiple when that keeps the width
        within the widest bucket. Returns {cap: [(g_start, member_ids)]}.
        """
        caps = self.route_buckets
        G = self.route_group
        order = q_idx[np.argsort(start[q_idx], kind="stable")]
        by_cap: dict[int, list] = {}

        def cover(width):
            for i, c in enumerate(caps):
                if c >= width:
                    return i
            return len(caps) - 1

        def close(members, g_start, width):
            cap = caps[cover(width)]
            by_cap.setdefault(cap, []).append((g_start, members))

        cur: list[int] = []
        g_start = g_end = 0
        ti = 0
        for q in order:
            s, e = int(start[q]), int(end[q])
            if not cur:
                cur = [q]
                g_start = s - (s % 128)
                if e - g_start > caps[-1]:
                    g_start = s          # alignment is best-effort
                g_end = max(e, g_start)
                ti = cover(g_end - g_start)
                continue
            new_end = max(g_end, e)
            width = new_end - g_start
            if len(cur) < G and width <= caps[ti]:
                cur.append(q)
                g_end = new_end
            elif (
                len(cur) < G // 2
                and ti + 1 < len(caps)
                and width <= caps[ti + 1]
            ):
                ti += 1
                cur.append(q)
                g_end = new_end
            else:
                close(cur, g_start, g_end - g_start)
                cur = [q]
                g_start = s - (s % 128)
                if e - g_start > caps[-1]:
                    g_start = s
                g_end = max(e, g_start)
                ti = cover(g_end - g_start)
        if cur:
            close(cur, g_start, g_end - g_start)
        return by_cap

    def _routed_dispatch(self, chunk, cap, qs, start, end, varg, scalars, k):
        """One grouped-window dispatch: ≤ routed_groups windows, each with
        ≤ route_group queries. The group count is padded to a power of two
        (bounded jit specializations per cap); pad groups/slots carry empty
        spans. Returns (device out, slot ids aligned to the NG·G layout,
        -1 = pad)."""
        G = self.route_group
        NG = 1 << max(0, len(chunk) - 1).bit_length()
        NG = min(max(NG, 1), self.routed_groups)
        g_start = np.zeros(NG, np.int32)
        st = np.zeros((NG, G), np.int32)
        en = np.zeros((NG, G), np.int32)
        slots = np.full(NG * G, -1, np.int64)
        for gi, (gs, members) in enumerate(chunk):
            g_start[gi] = gs
            for qi, q in enumerate(members):
                st[gi, qi] = start[q]
                en[gi, qi] = end[q]
                slots[gi * G + qi] = q
        a = self._slot_query_args(slots, qs)
        out = self._jit_routed(
            *varg,
            jnp.asarray(g_start), jnp.asarray(st), jnp.asarray(en),
            *map(jnp.asarray, a), *scalars,
            k=k, span_cap=cap,
        )
        return out, slots

    def _slot_query_args(self, slots, qs):
        """Query args for a grouped layout with interleaved -1 pad slots."""
        B = slots.size
        valid = slots >= 0
        sel = slots[valid]
        qV = np.zeros((B, _c.PADDED_DIM), np.float32)
        qV[valid] = pad_vectors_np(qs.V[sel].astype(np.float32))

        def pad(a, fill):
            out = np.full(B, fill, dtype=a.dtype)
            out[valid] = a[sel]
            return out

        return (
            qV,
            pad(qs.qtype, 0),
            pad(qs.v, -1.0),
            pad(qs.l, -1.0),
            pad(qs.r, -1.0),
        )

    def _query_args(self, batch_idx, qs, B: int | None = None):
        """Padded (B, ...) host query arrays for one batch."""
        B = B or self.query_batch
        bsz = batch_idx.size

        def pad(a, fill=0.0):
            out = np.full(B, fill, dtype=a.dtype)
            out[:bsz] = a[batch_idx]
            return out

        qV = np.zeros((B, _c.PADDED_DIM), np.float32)
        qV[:bsz] = pad_vectors_np(qs.V[batch_idx].astype(np.float32))
        return (
            qV,
            pad(qs.qtype),
            pad(qs.v, -1.0),
            pad(qs.l, -1.0),
            pad(qs.r, -1.0),
        )
