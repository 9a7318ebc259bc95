"""Sharded exact engine — the optimized_parallel.hpp analogue over a TPU mesh.

Mapping from the reference's thread-pool design (SURVEY.md §2a/§2b):

  ThreadPool static range split (threading.hpp:116-121)
      → database rows sharded over the mesh "d" axis (jax.sharding),
  per-thread private ``Knn`` (optimized_parallel.hpp:82-88)
      → per-device (B, k') running top-k carried through the local scan,
  barrier + serial ``Knn::merge`` (optimized_parallel.hpp:142-146)
      → ``all_gather`` over ICI + one exact top-k (parallel.collectives).

Candidates are *exactly refined on the shard that owns them* before the
merge, so the cross-device traffic is just (B, k') float+id tiles and no
device ever gathers remote vector rows; padding uses a small replicated tail
block (models.common.finalize_with_tail).

An optional "q" mesh axis additionally shards the query batch — pure query
data-parallelism the reference lacks (it runs queries strictly sequentially,
one fork-join per query, optimized_parallel.hpp:91).

Exactness certificate (``certified=True``): same construction as
BatchedEngine (see models/batched.py docstring), distributed — each shard's
per-bin worst-kept minimum and k'-cut boundary are reduced with ``pmin``
over the "d" axis inside the shard_map, so one replicated scalar per query
certifies the WHOLE sharded scan. Suspect batches escalate exactly like the
batched engine: deeper bin depth first, then the streaming exact path.

Host↔device traffic mirrors BatchedEngine: queries upload as one packed
(B, 104) raw-record block; ids and the certificate bit fetch as one int32
bundle; ``search(return_dists=False)`` skips the distance fetch (the
reference's vec_query contract is ids-only, src/test.cpp:95-110).
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
    QPACK_W,
    id_pack_mode,
    pack_query_block,
    packed_id_width,
)
from hvq_tpu.models.device_db import DeviceDB
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import exact_distances, resolve_precision
from hvq_tpu.ops.pallas_scan import BIN, last_round_dists
from hvq_tpu.parallel.collectives import allgather_topk_merge
from hvq_tpu.parallel.mesh import make_mesh
from hvq_tpu.utils.formats import Dataset, QuerySet


class ShardedEngine:
    """Multi-device exact scan: D rows over "d", optionally queries over "q"."""

    name = "sharded"

    def __init__(
        self,
        ds: Dataset,
        mesh=None,
        db_tile: int | None = None,
        query_batch: int = 256,
        kprime: int = 128,
        dtype=jnp.float32,
        precision: str = "high",
        topk_strategy: str = "topk",
        scan_impl: str = "auto",
        interpret: bool | None = None,
        dispatch_group: int = 8,
        certified: bool = True,
        bin_top: int | None = None,
        l2_min_w: int = 16384,
        scan_layout: str = "axis1",
        # 0 = rerun-only suspects (measured faster than in-program repair
        # on every dense engine, r4 — see models.batched module docstring)
        repair_bins: int = 0,
        repair_gate: bool = False,
    ):
        self.mesh = mesh or make_mesh()
        self.dispatch_group = dispatch_group
        self.n_d = self.mesh.shape["d"]
        self.n_q = self.mesh.shape.get("q", 1)
        if query_batch % max(self.n_q, 1):
            raise ValueError("query_batch must divide over the q axis")
        # Per-shard scan: the fused v3 Mosaic kernel (the measured TPU
        # winner, CHANGELOG r3) runs shard-locally inside the shard_map —
        # same policy as BatchedEngine, resolved before the DB layout
        # because v3 wants 16384-row tiles.
        if scan_impl == "auto":
            scan_impl = (
                "pallas_v3"
                if jax.devices()[0].platform == "tpu"
                else "xla"
            )
        if db_tile is None:
            db_tile = 16384 if scan_impl == "pallas_v3" else 8192
        elif (
            scan_impl == "pallas_v3"
            and (db_tile // BIN) % 128
            and jax.devices()[0].platform == "tpu"
        ):
            scan_impl = "xla_packed"    # tile too small for the v3 reshape
        if scan_impl == "pallas_v3":
            scan_layout = "axis1"       # the kernel emits the axis1 layout
        self.db = DeviceDB.from_dataset(
            ds,
            db_tile=db_tile,
            dtype=dtype,
            row_multiple=self.n_d * db_tile,
        )
        # Place the database row-sharded over "d" (replicated over "q").
        row_shard = NamedSharding(self.mesh, P("d"))
        self.db.Vp = jax.device_put(
            self.db.Vp, NamedSharding(self.mesh, P("d", None))
        )
        self.db.C = jax.device_put(self.db.C, row_shard)
        self.db.T = jax.device_put(self.db.T, row_shard)
        self.db.d_norms = jax.device_put(self.db.d_norms, row_shard)
        self.tail_V = jax.device_put(
            jnp.asarray(common.tail_block_np(ds.V, t=kprime)),
            NamedSharding(self.mesh, P()),
        )
        self.query_batch = query_batch
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        self.topk_strategy = topk_strategy
        self.compute_dtype = dtype
        self.certified = bool(
            certified
            and dtype == jnp.float32
            and self.precision
            in (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST)
        )
        # Per-shard fused Pallas kernel (same policy as BatchedEngine).
        from hvq_tpu.ops.pallas_scan import choose_bin_top, kernel_bin_top

        local_rows = self.db.n_pad // self.n_d
        if bin_top is not None:
            self.bin_top = bin_top
        elif scan_impl == "pallas":
            self.bin_top = kernel_bin_top(
                db_tile, local_rows, kprime, certified=self.certified
            )
        else:
            # v3's out_w = R·(Dt/128) is 128-aligned whenever Dt ≥ 16384,
            # so the plain Poisson choice applies unrounded.
            self.bin_top = choose_bin_top(
                local_rows, kprime, certified=self.certified
            )
        if (
            scan_impl in ("pallas", "pallas_v3", "xla_deferred", "xla_packed")
            and self.bin_top is None
        ):
            scan_impl = "xla"
        self.scan_impl = scan_impl
        self.interpret = (
            jax.devices()[0].platform != "tpu"
            if interpret is None
            else interpret
        )
        self._dn_max = (
            float(jnp.max(self.db.d_norms)) if self.certified else 0.0
        )
        # Gated on n_pad — see BatchedEngine (covers every representable
        # position by construction).
        self._id_mode = id_pack_mode(self.db.n_pad, _c.K_DEFAULT)
        # see BatchedEngine.l2_min_w (constructor-only: baked into the
        # traced program at first compile)
        self.l2_min_w = l2_min_w
        self.scan_layout = scan_layout
        # in-program bin-repair width (see common.bin_repair_candidates)
        self.repair_bins = int(repair_bins)
        self.repair_gate = bool(repair_gate)
        # Certificate forensics (HVQ_CERT_TERMS=1 before construction):
        # same bitmask semantics as BatchedEngine (1 = bin/residual,
        # 2 = level-2, 4 = k'-cut). Each term is pmin-reduced over "d"
        # separately so the histogram matches the single-chip engines on
        # the same layout (the diagnostic that drove the round-2 repair).
        import os as _os

        self._cert_debug = _os.environ.get("HVQ_CERT_TERMS") == "1"
        self._last_cert_terms: np.ndarray | None = None
        self._search_jit = jax.jit(
            self._search_batch,
            static_argnames=("k", "impl", "bin_top", "level2"),
        )
        self._search_group_jit = jax.jit(
            self._search_group,
            static_argnames=("k", "impl", "bin_top", "level2"),
        )

    def _bundle(self, ids, suspect):
        from hvq_tpu.models.batched import bundle_ids

        return bundle_ids(ids, suspect, self._id_mode)

    def _unbundle_ids(self, arr, k: int):
        from hvq_tpu.models.batched import unbundle_ids

        return unbundle_ids(arr, k, self._id_mode)

    def _search_group(self, Vp, C, T, dn, tail_V, Qblk_g, sn, n, k,
                      impl=None, bin_top=None, level2=True):
        """G query batches per device dispatch (latency amortization)."""

        def step(_, Qblk):
            return None, self._search_batch(
                Vp, C, T, dn, tail_V, Qblk, sn, n, k, impl, bin_top, level2
            )

        _, out = jax.lax.scan(step, None, Qblk_g)
        return out

    # --- jitted core -----------------------------------------------------
    def _search_batch(self, Vp, C, T, dn, tail_V, Qblk, sn, n, k,
                      impl=None, bin_top=None, level2=True):
        db_tile = self.db.db_tile
        kprime = self.kprime
        precision = self.precision
        strategy = self.topk_strategy
        compute_dtype = self.compute_dtype
        impl = self.scan_impl if impl is None else impl
        bin_top = self.bin_top if bin_top is None else bin_top

        B = Qblk.shape[0]
        qV = jnp.concatenate(
            [
                Qblk[:, : _c.VEC_DIM],
                jnp.zeros((B, _c.PADDED_DIM - _c.VEC_DIM), Qblk.dtype),
            ],
            axis=1,
        )
        qtype = Qblk[:, _c.VEC_DIM].astype(jnp.int32)
        v = Qblk[:, _c.VEC_DIM + 1]
        l = Qblk[:, _c.VEC_DIM + 2]
        r = Qblk[:, _c.VEC_DIM + 3]
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )

        def local_scan(Vp_l, C_l, T_l, dn_l, qV_l, ac_l, v_l, at_l, l_l, r_l, sn_, n_):
            local_n = Vp_l.shape[0]
            nt = local_n // db_tile
            offset = jax.lax.axis_index("d") * local_n
            qb = common.QueryBatch(qV_l, ac_l, v_l, at_l, l_l, r_l)
            Bl = qV_l.shape[0]
            # Certificate terms, kept SEPARATE through the mesh so the
            # HVQ_CERT_TERMS bitmask matches the single-chip engines
            # (suspect = any term under threshold, as before).
            inf = jnp.full((Bl,), jnp.inf, jnp.float32)
            cert_bin, cert_l2, cert_kc = inf, inf, inf
            if impl in ("pallas", "pallas_v3", "xla_deferred", "xla_packed"):
                from hvq_tpu.ops.pallas_scan import (
                    deferred_bin_scan_xla,
                    deferred_packed_scan_xla,
                    fused_packed_scan,
                    fused_packed_scan_v3,
                    v3_query_block,
                )

                gid_l = (
                    jnp.arange(local_n, dtype=jnp.int32) + offset
                ).astype(jnp.int32)
                if impl == "pallas_v3":
                    out_s, out_i = fused_packed_scan_v3(
                        Vp_l, C_l, T_l, dn_l, gid_l,
                        qV_l, ac_l, v_l, at_l, l_l, r_l, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        b_block=v3_query_block(qV_l.shape[0], 256),
                        interpret=self.interpret,
                    )
                    out_i = out_i + offset  # local positions → global ids
                elif impl == "pallas":
                    out_s, out_i = fused_packed_scan(
                        Vp_l, C_l, T_l, dn_l, gid_l,
                        qV_l, ac_l, v_l, at_l, l_l, r_l, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        interpret=self.interpret,
                        precision=precision,
                    )
                    out_i = out_i + offset  # local positions → global ids
                elif impl == "xla_packed":
                    out_s, out_i = deferred_packed_scan_xla(
                        Vp_l, C_l, T_l, dn_l, gid_l,
                        qV_l, ac_l, v_l, at_l, l_l, r_l, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        precision=precision,
                        layout=self.scan_layout,
                    )
                    out_i = out_i + offset  # local positions → global ids
                else:
                    out_s, out_i = deferred_bin_scan_xla(
                        Vp_l, C_l, T_l, dn_l, gid_l,
                        qV_l, ac_l, v_l, at_l, l_l, r_l, sn_,
                        db_tile=db_tile, bin_top=bin_top,
                        precision=precision,
                    )
                W = out_s.shape[1]
                kp = min(kprime, W)
                worst2 = None
                # level-2 gates: see BatchedEngine (axis1 needs
                # bins2 >= 128, lane needs nt >= 128)
                l2_ok = (
                    W >= 16384
                    if self.scan_layout == "axis1"
                    else nt >= 128
                )
                if level2 and W >= self.l2_min_w and l2_ok:
                    from hvq_tpu.ops.topk import binned_stream_topk

                    scores, gids, worst2 = binned_stream_topk(
                        out_s, out_i, kp, nt=nt, layout=self.scan_layout
                    )
                else:
                    top_neg, idx = jax.lax.top_k(-out_s, kp)
                    scores = -top_neg
                    gids = jnp.take_along_axis(out_i, idx, axis=1)
                if self.certified:
                    # per-shard saturation levels; pmin over "d" below makes
                    # them a certificate for the whole sharded scan
                    if kp < W:
                        cert_kc = scores[:, kp - 1]
                    if self.repair_bins and impl in (
                        "xla_packed", "pallas_v3"
                    ):
                        # in-program bin repair (common.bin_repair_
                        # candidates): gathers are shard-LOCAL, candidate
                        # ids global — id_offset translates at the edge.
                        # thr_pre from the LOCAL k-th estimate still upper-
                        # bounds the GLOBAL final threshold (the global
                        # k-th exact distance is ≤ any shard's local one)
                        thr_pre = (
                            common.repair_thr_pre(
                                scores, k, qV_l, self._dn_max,
                                _CERT_REL_MM, _CERT_REL_T, _CERT_ABS,
                            )
                            if self.repair_gate
                            else None
                        )
                        scores, gids, cert_bin = (
                            common.bin_repair_candidates(
                                out_s, scores, gids, nt, bin_top,
                                db_tile // BIN, db_tile, self.scan_layout,
                                C_l, T_l, gid_l, qb, sn_,
                                self.repair_bins, id_offset=offset,
                                thr_pre=thr_pre,
                            )
                        )
                    else:
                        worst = last_round_dists(
                            out_s, nt, bin_top, db_tile // BIN
                        )
                        cert_bin = jnp.min(worst, axis=1)
                    if worst2 is not None:
                        cert_l2 = worst2
            else:
                tiles = (
                    Vp_l.reshape(nt, db_tile, Vp_l.shape[-1]),
                    C_l.reshape(nt, db_tile),
                    T_l.reshape(nt, db_tile),
                    dn_l.reshape(nt, db_tile),
                )
                scores, gids = common.scan_database(
                    tiles,
                    qb,
                    sn_,
                    kprime=kprime,
                    db_tile=db_tile,
                    id_offset=offset,
                    precision=precision,
                    strategy=strategy,
                    compute_dtype=compute_dtype,
                )
            # Exact per-shard refinement: every candidate's row is local.
            valid = jnp.isfinite(scores)
            local_idx = jnp.clip(gids - offset, 0, local_n - 1)
            rows = jnp.take(Vp_l, local_idx, axis=0)
            exact = jnp.where(valid, exact_distances(qb.qV, rows), jnp.inf)
            if exact.shape[1] > kprime:
                # repair widened the candidate set: pre-select the local
                # exact top-k' so the ICI all-gather stays k'-wide
                top_neg, tidx = jax.lax.top_k(-exact, kprime)
                exact = -top_neg
                gids = jnp.take_along_axis(gids, tidx, axis=1)
            # Knn::merge over ICI (optimized_parallel.hpp:142-146 analogue).
            m_d, m_i = allgather_topk_merge(exact, gids, kprime, axis_name="d")
            cert = tuple(
                jax.lax.pmin(c, axis_name="d")
                for c in (cert_bin, cert_l2, cert_kc)
            )
            return (m_d, m_i) + cert

        merged_d, merged_ids, cert_bin, cert_l2, cert_kc = _shard_map(
            local_scan,
            mesh=self.mesh,
            in_specs=(
                P("d", None), P("d"), P("d"), P("d"),
                P("q", None), P("q"), P("q"), P("q"), P("q"), P("q"),
                P(), P(),
            ),
            out_specs=(
                P("q", None), P("q", None), P("q"), P("q"), P("q"),
            ),
            check_vma=False,
        )(Vp, C, T, dn, qV, active_c, vv, active_t, ll, rr, sn, n)

        qb_global = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        f_ids, f_d = common.finalize_with_tail(
            merged_d, merged_ids, tail_V, qb_global, n, k
        )
        if self.certified and impl in (
            "pallas", "pallas_v3", "xla_deferred", "xla_packed"
        ):
            t = f_d[:, k - 1]
            qnorm = jnp.sum(qV.astype(jnp.float32) ** 2, axis=1)
            thr = t + (
                _CERT_REL_MM * (qnorm + self._dn_max)
                + _CERT_REL_T * t
                + _CERT_ABS
            )
            # Per-term thresholds — identical bitmask semantics to the
            # single-chip engines (absent terms are +inf → bit stays 0).
            suspect = common.cert_suspect(
                cert_bin < thr, cert_l2 < thr, cert_kc < thr,
                self._cert_debug,
            )
        else:
            suspect = jnp.zeros((B,), bool)
        return self._bundle(f_ids, suspect), f_d

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

        n = self.db.n
        sn = jnp.int32(int(sample_proportion * n))
        n_t = jnp.int32(n)
        B = self.query_batch

        with maybe_phase(phases, "search/pack"):
            Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
            Qpack = pack_query_block(Vq.astype(np.float32), qtype, v, l, r)
        qrep2 = NamedSharding(self.mesh, P("q", None))
        grep2 = NamedSharding(self.mesh, P(None, "q", None))
        db_args = (
            self.db.Vp, self.db.C, self.db.T, self.db.d_norms, self.tail_V,
        )
        kw = packed_id_width(k, self._id_mode) + 1
        bundle_raw = np.empty((m_pad, kw), dtype=np.int32)
        dists_out = (
            np.empty((m_pad, k), dtype=np.float32) if return_dists else None
        )
        G = max(1, self.dispatch_group)
        # Enqueue all dispatches, fetch at the end (see BatchedEngine.search:
        # overlaps uploads with compute, pipelines per-call latency).
        pending = []
        s = 0
        with maybe_phase(phases, "search/enqueue"):
            while s < m_pad:
                nb = (m_pad - s) // B
                if nb >= G:
                    e = s + G * B
                    b_b, d_b = self._search_group_jit(
                        *db_args,
                        jax.device_put(
                            Qpack[s:e].reshape(G, B, QPACK_W), grep2
                        ),
                        sn, n_t, k=k,
                    )
                else:
                    e = s + B
                    b_b, d_b = self._search_jit(
                        *db_args,
                        jax.device_put(Qpack[s:e], qrep2),
                        sn, n_t, k=k,
                    )
                pending.append((s, e, b_b, d_b))
                s = e
        with maybe_phase(phases, "search/fetch"):
            common.prefetch_host(
                x for _, _, b_b, d_b in pending
                for x in ((b_b, d_b) if return_dists else (b_b,))
            )
            for s, e, b_b, d_b in pending:
                bundle_raw[s:e] = np.asarray(b_b).reshape(e - s, kw)
                if return_dists:
                    dists_out[s:e] = np.asarray(d_b).reshape(e - s, k)

        ids_raw, suspects = bundle_raw[:, :-1], bundle_raw[:, -1].astype(bool)
        if self._cert_debug:
            self._last_cert_terms = bundle_raw[: qs.m, -1].copy()
        if suspects.any():
            # ids_raw is a view of bundle_raw: ladder writes land in place
            with maybe_phase(phases, "search/rerun"):
                self._rerun_suspects(
                    Qpack, qrep2, suspects, ids_raw, dists_out,
                    sn, n_t, k, kw, B,
                )
        ids_out, _ = self._unbundle_ids(bundle_raw, k)
        return (
            ids_out[: qs.m].astype(np.uint32),
            dists_out[: qs.m] if return_dists else None,
        )

    def _rerun_suspects(
        self, Qpack, qrep2, suspects, ids_raw, dists_out, sn, n_t, k, kw, B
    ):
        """BatchedEngine's compacted escalation ladder
        (models.batched.rerun_suspect_ladder), with uploads sharded over
        the mesh's "q" axis."""
        from hvq_tpu.models.batched import rerun_suspect_ladder

        deeper = None
        if self.scan_impl in (
            "pallas", "pallas_v3", "xla_packed", "xla_deferred"
        ):
            d = min(2 * self.bin_top, BIN)
            deeper = d if d > self.bin_top else None
        db_args = (
            self.db.Vp, self.db.C, self.db.T, self.db.d_norms, self.tail_V,
        )

        def run(sel, impl, bin_top):
            return self._search_jit(
                *db_args, jax.device_put(Qpack[sel], qrep2), sn, n_t,
                k=k, impl=impl, bin_top=bin_top, level2=False,
            )

        rerun_suspect_ladder(
            suspects, ids_raw, dists_out, B, kw, k, deeper, run
        )
