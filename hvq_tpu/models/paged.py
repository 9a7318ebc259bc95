"""Paged exact engine — databases that outgrow HBM (VERDICT r3 #4).

Every other engine uploads complete device-resident views, capping the
database at one chip's HBM (~1.5·10⁷ fp32 rows on a 16 GB v5e beside the
scan workspace). This engine keeps the database HOST-resident (the
reference's own stance — io.h:111-136 reads into host RAM sized vectors)
and streams it through HBM in window-sized slabs:

  for each window (w0, wlen):                      [host → device upload]
      for each query batch:                        [device]
          certified packed scan of the window      (pallas_v3 / xla_packed)
          level-2 reduce + top-k'                  (ops.topk)
          in-program bin repair                    (common.bin_repair_*)
          EXACT fp32 refinement of the k' survivors on the RESIDENT rows
          → fetch (exact k', global ids, certificate terms)
  host: running top-k' merge across windows, reference-exact pad-to-k,
        final ascending sort.

Exactness mirrors the resident engines, with the window twist that the
certificate threshold needs the FINAL k-th distance, known only after the
last window. Rather than re-uploading flagged windows afterwards (the r4
design — measured 259 s of re-upload wire in a 710 s D=2.5·10⁷ search,
a 1.36× multiplier on a mode whose whole cost model is upload bytes,
VERDICT r4 #4), suspects are resolved WHILE THE WINDOW IS STILL RESIDENT
against a RUNNING threshold: after merging window w, the current k-th
best distance t_w is an upper bound on t_final (later windows only
improve it), and with the row-norm slack taken over the WHOLE database
up front (``_dn_max_bound``), thr(t_w) ≥ thr(t_final) — so every query
the final check would flag is already flagged at window w. Flagged
(window, query) pairs re-run the streaming-exact scan (no bin reduce —
certified by construction) on the resident window in compacted pow-2
batches; the union with the packed results restores exactness (packed
candidates are exact distances, merely possibly incomplete). Zero
re-upload wire by construction. The conservatism is mild: early windows
use a slightly loose t (their own k-th best), and queries with fewer
than k predicate matches keep t = +inf and pay one exact rung per
window — both compute-only, on a mode that is wire-bound.

One full pass over the database serves ALL queries (bandwidth-optimal: the
window upload amortizes over every batch). Throughput is upload-bound by
construction — wire bytes/search = database size — so this mode exists for
CAPACITY, not speed: on this environment's ~40-60 MB/s relay a 10⁷-row
search pass costs ~2 min of wire time; on a real PCIe host (~10+ GB/s) the
same pass is under a second. Use the resident engines whenever the
database fits.

Reference anchor: the reference has no out-of-core mode at all; this is
the capability README.md's "databases that outgrow HBM" promises.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.models import common
from hvq_tpu.models.batched import (
    _CERT_ABS,
    _CERT_REL_MM,
    _CERT_REL_MM_BF16,
    _CERT_REL_T,
    QPACK_W,
    _pow2_batch,
    dispatch_plan,
    pack_query_block,
)
from hvq_tpu.ops import masks as mask_ops
from hvq_tpu.ops.distance import exact_distances, resolve_precision
from hvq_tpu.ops.pallas_scan import (
    BIN,
    choose_bin_top,
    deferred_packed_scan_xla,
    fused_packed_scan_v3,
    last_round_dists,
    v3_query_block,
)
from hvq_tpu.utils.formats import Dataset, QuerySet


class PagedEngine:
    """Host-resident database, streamed through HBM window by window."""

    name = "paged"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int | None = None,
        query_batch: int = 1024,
        kprime: int | None = None,
        precision: str = "high",
        scan_impl: str = "auto",
        window_rows: int | None = None,
        hbm_budget_bytes: float = 10e9,
        certified: bool = True,
        bin_top: int | None = None,
        l2_min_w: int = 16384,
        # 0 = rerun-only suspects (the paged rerun rung runs while the
        # window is still resident, so it stays one-pass; measured faster
        # than in-program repair on every dense engine, r4)
        repair_bins: int = 0,
        scan_store: str = "fp32",
        dispatch_group: int = 8,
    ):
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
            and (db_tile // BIN) % 128
            and jax.devices()[0].platform == "tpu"
        ):
            scan_impl = "xla_packed"
        self.scan_impl = scan_impl
        self._interpret = jax.devices()[0].platform != "tpu"
        self.ds = ds
        self.db_tile = db_tile
        self.query_batch = query_batch
        if kprime is None:
            # bf16 plane: widen k' like the dense engines (batched.py) so
            # the k'-cut certificate term stays quiet under the widened
            # slack — a flagged window here costs a RE-UPLOAD over the
            # relay, the most expensive resource in paged mode.
            kprime = 240 if scan_store == "bf16" else 128
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        self.certified = bool(
            certified
            and self.precision
            in (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST)
        )
        self._bf16_plane = scan_store == "bf16"
        self._rel_mm = _CERT_REL_MM_BF16 if self._bf16_plane else _CERT_REL_MM
        self.l2_min_w = l2_min_w
        self.repair_bins = int(repair_bins)
        self.dispatch_group = dispatch_group

        # Window size: fill the HBM budget with one resident slab + the
        # scan workspace headroom the budget is assumed to exclude. Bytes
        # per padded row: fp32 vectors (512) + C/T/dn/oid (16) + the bf16
        # plane (256) when enabled.
        row_bytes = _c.PADDED_DIM * 4 + 16 + (256 if self._bf16_plane else 0)
        if window_rows is None:
            window_rows = int(hbm_budget_bytes // row_bytes)
        window_rows = max(db_tile, window_rows - window_rows % db_tile)
        self.window_rows = window_rows
        n = ds.n
        self.windows = [
            (w0, min(window_rows, n - w0))
            for w0 in range(0, n, window_rows)
        ]
        # Bin depth from the PADDED window size (the per-window Poisson
        # load); every window shares it so one program serves all.
        wpad = -(-min(window_rows, n) // db_tile) * db_tile
        if bin_top is not None:
            self.bin_top = bin_top
        else:
            self.bin_top = choose_bin_top(
                wpad, kprime, certified=self.certified
            )
        if self.bin_top is None:
            self.scan_impl = "xla"      # tiny windows: streaming exact scan
        self._jit_window = jax.jit(
            self._scan_window,
            static_argnames=("kp", "impl", "bin_top", "level2"),
        )
        self._jit_window_group = jax.jit(
            self._scan_window_group,
            static_argnames=("kp", "impl", "bin_top", "level2"),
        )
        self._dn_max: float | None = None

    def _dn_max_bound(self) -> float:
        """Upper bound on max‖d‖² over the WHOLE database (host, chunked).

        The running-threshold certificate (see module docstring) compares
        window-w terms against thr(t_w) BEFORE later windows are seen, so
        the ‖d‖²-dependent slack term must already cover every row. One
        float64 pass at first certified search, cached on the engine.
        """
        if self._dn_max is None:
            m = 0.0
            V = self.ds.V
            for s in range(0, V.shape[0], 1 << 20):
                c = np.asarray(V[s : s + (1 << 20)], np.float64)
                m = max(m, float(np.einsum("nd,nd->n", c, c).max()))
            self._dn_max = float(
                np.nextafter(np.float32(m), np.float32(np.inf))
            )
        return self._dn_max

    # --- jitted per-window core -------------------------------------------
    def _scan_window(
        self,
        Vw, Vs, Cw, Tw, dnw, oidw,   # resident window (wpad, ...); Vs = scan plane
        Qblk,                        # (B, QPACK_W) packed query block
        sn, w0,                      # traced scalars
        kp: int,
        impl: str,
        bin_top: int | None,
        level2: bool = True,
    ):
        """One query batch against one resident window.

        Returns (exact (B, kp) fp32 ascending-ish with +inf empties,
        gid (B, kp) int32 GLOBAL ids, terms (B, 3) fp32 certificate
        saturation levels [bin, level-2, k'-cut], +inf = term absent).
        """
        B = Qblk.shape[0]
        qV = jnp.concatenate(
            [
                Qblk[:, : _c.VEC_DIM],
                jnp.zeros((B, _c.PADDED_DIM - _c.VEC_DIM), Qblk.dtype),
            ],
            axis=1,
        )
        qtype = Qblk[:, _c.VEC_DIM].astype(jnp.int32)
        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, Qblk[:, _c.VEC_DIM + 1], Qblk[:, _c.VEC_DIM + 2],
            Qblk[:, _c.VEC_DIM + 3],
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        Dt = self.db_tile
        wpad = Vw.shape[0]
        nt = wpad // Dt
        inf = jnp.full((B,), jnp.inf, jnp.float32)
        t_bin, t_l2, t_kc = inf, inf, inf
        if impl in ("pallas_v3", "xla_packed"):
            if impl == "pallas_v3":
                out_s, out_i = fused_packed_scan_v3(
                    Vs, Cw, Tw, dnw, oidw,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    b_block=v3_query_block(B, 256),
                    interpret=self._interpret,
                )
            else:
                out_s, out_i = deferred_packed_scan_xla(
                    Vs, Cw, Tw, dnw, oidw,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    precision=self.precision,
                    layout="axis1",
                )
            W = out_s.shape[1]
            kpc = min(kp, W)
            worst2 = None
            if level2 and W >= self.l2_min_w and W >= 16384:
                from hvq_tpu.ops.topk import binned_stream_topk

                scores, pos, worst2 = binned_stream_topk(
                    out_s, out_i, kpc, nt=nt, layout="axis1"
                )
            else:
                top_neg, idx = jax.lax.top_k(-out_s, kpc)
                scores = -top_neg
                pos = jnp.take_along_axis(out_i, idx, axis=1)
            kcut = scores[:, kpc - 1] if kpc < W else None
            remaining_min = None
            if self.certified and self.repair_bins:
                scores, pos, remaining_min = common.bin_repair_candidates(
                    out_s, scores, pos, nt, bin_top, Dt // BIN, Dt,
                    "axis1", Cw, Tw, oidw, qb, sn, self.repair_bins,
                )
            if self.certified:
                t_bin = (
                    remaining_min
                    if remaining_min is not None
                    else jnp.min(
                        last_round_dists(out_s, nt, bin_top, Dt // BIN),
                        axis=1,
                    )
                )
                if worst2 is not None:
                    t_l2 = worst2
                if kcut is not None:
                    t_kc = kcut
        else:
            # streaming-exact rung (certified by construction): the rerun
            # target for flagged (window, query) pairs
            tiles = (
                Vw.reshape(nt, Dt, Vw.shape[-1]),
                Cw.reshape(nt, Dt),
                Tw.reshape(nt, Dt),
                dnw.reshape(nt, Dt),
            )
            scores, pos = common.scan_database(
                tiles, qb, sn, kprime=kp, db_tile=Dt,
                precision=self.precision,
                oid_tiles=oidw.reshape(nt, Dt),
            )
        # EXACT refinement on the resident rows — windows leave HBM, so
        # this must happen now (the sharded engines' refine-on-the-owner
        # pattern applied to time instead of space).
        valid = jnp.isfinite(scores)
        rows = jnp.take(Vw, pos, axis=0)
        exact = jnp.where(valid, exact_distances(qb.qV, rows), jnp.inf)
        if exact.shape[1] > kp:
            top_neg, tidx = jax.lax.top_k(-exact, kp)
            exact = -top_neg
            pos = jnp.take_along_axis(pos, tidx, axis=1)
        gid = jnp.where(
            jnp.isfinite(exact), pos + w0, jnp.int32(0)
        ).astype(jnp.int32)
        terms = jnp.stack([t_bin, t_l2, t_kc], axis=1)
        return exact, gid, terms

    def _scan_window_group(
        self, Vw, Vs, Cw, Tw, dnw, oidw, Qblk_g, sn, w0,
        kp: int, impl: str, bin_top: int | None, level2: bool = True,
    ):
        """G query batches against one window in ONE dispatch."""

        def step(_, Qblk):
            return None, self._scan_window(
                Vw, Vs, Cw, Tw, dnw, oidw, Qblk, sn, w0, kp, impl, bin_top,
                level2,
            )

        _, out = jax.lax.scan(step, None, Qblk_g)
        return out

    # --- window upload -----------------------------------------------------
    def _upload_window(self, w0: int, wlen: int):
        """Host slab → padded device window (+ optional bf16 scan plane)."""
        from hvq_tpu.utils.transfer import upload_rows

        Dt = self.db_tile
        wpad = -(-wlen // Dt) * Dt
        raw = upload_rows(
            np.ascontiguousarray(np.asarray(self.ds.V[w0 : w0 + wlen],
                                            np.float32))
        )
        Vw = jnp.pad(
            raw, ((0, wpad - wlen), (0, _c.PADDED_DIM - raw.shape[1]))
        )
        del raw
        dnw = jnp.sum(Vw * Vw, axis=1)
        Vs = Vw.astype(jnp.bfloat16) if self._bf16_plane else Vw

        def padded(a, fill):
            out = np.full(wpad, fill, dtype=np.float32)
            out[:wlen] = a[w0 : w0 + wlen]
            return jnp.asarray(out)

        Cw = padded(self.ds.C, np.inf)
        Tw = padded(self.ds.T, np.inf)
        # global original ids; pad rows get n (≥ sn ⇒ always masked)
        oidw = jnp.asarray(
            np.concatenate(
                [
                    np.arange(w0, w0 + wlen, dtype=np.int32),
                    np.full(wpad - wlen, self.ds.n, np.int32),
                ]
            )
        )
        return Vw, Vs, Cw, Tw, dnw, oidw

    # --- host driver ---------------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
        return_dists: bool = True,
        phases=None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        from hvq_tpu.utils.timing import maybe_phase

        n = self.ds.n
        sn = jnp.int32(int(sample_proportion * n))
        B = self.query_batch
        kp = self.kprime

        with maybe_phase(phases, "search/pack"):
            Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
            Qpack = pack_query_block(Vq.astype(np.float32), qtype, v, l, r)
        with maybe_phase(phases, "search/upload"):
            Q_dev = jax.device_put(Qpack)

        nb = m_pad // B
        best_d = np.full((m_pad, kp), np.inf, np.float32)
        best_g = np.zeros((m_pad, kp), np.int64)
        certified = self.certified and self.scan_impl != "xla"
        if certified:
            dn_max = self._dn_max_bound()
            qn = np.einsum(
                "md,md->m", qs.V.astype(np.float64), qs.V.astype(np.float64)
            ).astype(np.float32)
        impl = self.scan_impl
        for wi, (w0, wlen) in enumerate(self.windows):
            with maybe_phase(phases, "search/window_upload"):
                win = self._upload_window(w0, wlen)
            pending = []
            terms_w = np.full((m_pad, 3), np.inf, np.float32)
            with maybe_phase(phases, "search/enqueue"):
                s = 0
                for G in dispatch_plan(nb, self.dispatch_group):
                    e = s + G * B
                    if G > 1:
                        out = self._jit_window_group(
                            *win, Q_dev[s:e].reshape(G, B, QPACK_W),
                            sn, jnp.int32(w0),
                            kp=kp, impl=impl, bin_top=self.bin_top,
                        )
                    else:
                        out = self._jit_window(
                            *win, Q_dev[s:e], sn, jnp.int32(w0),
                            kp=kp, impl=impl, bin_top=self.bin_top,
                        )
                    pending.append((s, e, out))
                    s = e
            with maybe_phase(phases, "search/fetch"):
                common.prefetch_host(
                    x for _, _, (ex, gid, tm) in pending
                    for x in ((ex, gid, tm) if certified else (ex, gid))
                )
                for s, e, (ex, gid, tm) in pending:
                    # stream width can be < k' on tiny windows (W = nt·R·bins)
                    ex = np.asarray(ex).reshape(e - s, -1)
                    gid = np.asarray(gid).reshape(e - s, -1)
                    self._merge(best_d, best_g, s, e, ex, gid)
                    if certified:
                        terms_w[s:e] = np.asarray(tm).reshape(e - s, 3)
            if certified:
                # Running-threshold certificate (module docstring): t_w =
                # current k-th best ≥ t_final and dn_max covers all rows,
                # so thr(t_w) ≥ thr(t_final) — any query the final check
                # would flag for THIS window is flagged here, and resolved
                # while the window is still resident (no re-upload, ever).
                # Queries with < k finite candidates keep t_w = +inf and
                # conservatively re-run exact (their pad-to-k distances
                # are unknowable before the last window).
                t_w = np.partition(best_d[: qs.m], k - 1, axis=1)[:, k - 1]
                thr = t_w + (
                    self._rel_mm * (qn + dn_max)
                    + _CERT_REL_T * t_w
                    + _CERT_ABS
                )
                thr = np.where(np.isfinite(t_w), thr, np.inf)
                sus = np.nonzero(
                    (terms_w[: qs.m] < thr[:, None]).any(axis=1)
                )[0]
                if sus.size:
                    with maybe_phase(phases, "search/rerun"):
                        self._rerun_resident(
                            win, w0, wlen, sus, Qpack, sn, kp,
                            best_d, best_g,
                        )
            del win, pending

        with maybe_phase(phases, "search/finalize"):
            ids_out, dists_out = self._finalize_host(best_d, best_g, qs, k)
        return (
            ids_out[: qs.m].astype(np.uint32),
            dists_out[: qs.m] if return_dists else None,
        )

    @staticmethod
    def _merge(best_d, best_g, s, e, ex, gid):
        """Running host top-k' merge of one window's exact candidates."""
        kp = best_d.shape[1]
        cat_d = np.concatenate([best_d[s:e], ex], axis=1)
        cat_g = np.concatenate([best_g[s:e], gid.astype(np.int64)], axis=1)
        sel = np.argpartition(cat_d, kp - 1, axis=1)[:, :kp]
        best_d[s:e] = np.take_along_axis(cat_d, sel, axis=1)
        best_g[s:e] = np.take_along_axis(cat_g, sel, axis=1)

    def _finalize_host(self, best_d, best_g, qs, k: int):
        """Reference-exact pad-to-k + ascending sort (host, vectorized)."""
        n = self.ds.n
        m = best_d.shape[0]
        order = np.argsort(best_d, axis=1)[:, :k]
        sel_d = np.take_along_axis(best_d, order, axis=1)
        sel_g = np.take_along_axis(best_g, order, axis=1)
        valid = np.isfinite(sel_d)
        mcount = valid.sum(axis=1)
        need = ~valid
        if need.any():
            rows, cols = np.nonzero(need)
            pad_id = n - 1 - (cols - mcount[rows])
            qrows = np.minimum(rows, qs.m - 1)
            diff = self.ds.V[pad_id].astype(np.float64) - qs.V[
                qrows
            ].astype(np.float64)
            sel_d[need] = np.einsum("jd,jd->j", diff, diff).astype(
                np.float32
            )
            sel_g[need] = pad_id
        order2 = np.argsort(sel_d, axis=1, kind="stable")
        return (
            np.take_along_axis(sel_g, order2, axis=1),
            np.take_along_axis(sel_d, order2, axis=1),
        )

    def _rerun_resident(
        self, win, w0, wlen, q_idx, Qpack, sn, kp, best_d, best_g
    ):
        """Streaming-exact re-scan of the STILL-RESIDENT window for its
        flagged queries (compacted pow-2 batches) — the zero-re-upload
        rerun the running-threshold certificate enables. The union with
        the packed results restores exactness: packed candidates are
        exact distances, merely possibly incomplete."""
        B = self.query_batch
        for s in range(0, q_idx.size, B):
            sel = q_idx[s : s + B]
            Br = _pow2_batch(sel.size, B)
            pad = np.concatenate([sel, np.repeat(sel[:1], Br - sel.size)])
            ex, gid, _ = self._jit_window(
                *win, jax.device_put(Qpack[pad]), sn, jnp.int32(w0),
                kp=kp, impl="xla", bin_top=None,
            )
            common.prefetch_host((ex, gid))
            ex = np.asarray(ex).reshape(Br, -1)[: sel.size]
            gid = np.asarray(gid).reshape(Br, -1)[: sel.size]
            # EVICT this window's packed contributions first: the
            # stream result is the window's complete exact top-k', so
            # a plain union would duplicate ids (both sides carry the
            # same rows). Sound because k' >= k bounds any single
            # window's useful contribution.
            bd = best_d[sel].copy()
            bg = best_g[sel].copy()
            bd[(bg >= w0) & (bg < w0 + wlen)] = np.inf
            cat_d = np.concatenate([bd, ex], axis=1)
            cat_g = np.concatenate([bg, gid.astype(np.int64)], axis=1)
            ss = np.argpartition(cat_d, kp - 1, axis=1)[:, :kp]
            best_d[sel] = np.take_along_axis(cat_d, ss, axis=1)
            best_g[sel] = np.take_along_axis(cat_g, ss, axis=1)
