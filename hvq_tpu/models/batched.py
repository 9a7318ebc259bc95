"""Batched exact engine — the single-chip flagship (optimized.hpp analogue).

Where the reference streams one candidate at a time through an AVX2 distance
kernel into a 100-slot array (include/optimized.hpp:54-146), this engine:

* batches ``query_batch`` queries into one (B, 128) block,
* scans the database in ``db_tile``-row tiles,
* computes each (B, Dt) distance tile as a ‖d‖² − 2·Q·Dᵀ MXU matmul with the
  predicate mask fused in (ops.distance / ops.masks),
* selects k' candidates per query, then exactly re-refines them in fp32 and
  applies the reference's pad-to-k semantics (models.common.finalize).

``precision`` governs only the SELECTION matmul (which candidates make the
k' cut); reported distances always come from the direct-fp32 refinement
(ops.distance.exact_distances), so "high" (3-pass bf16, error ≈ 2⁻²¹ —
below the packed-key quantization of 2⁻¹⁶) keeps the exactness contract
while skipping the 6-pass fp32 emulation. "highest" remains available.

Scan implementations (``scan_impl``; measured ladder in CHANGELOG.md):

* ``"xla_packed"`` (default on TPU) — deferred top-R-per-bin selection with
  packed distance+lane int32 keys: one min-reduce per bin round, candidate
  positions recovered arithmetically, one ``lax.top_k`` per batch. 14× the
  streaming-top-k path at 10⁶ rows (8221 QPS medium set).
* ``"pallas"`` — the fused Pallas kernel (ops.pallas_scan): same algorithm
  with the (B, Dt) score tile living only in VMEM. The intended default on
  standard TPU runtimes; this build environment's axon relay hangs on
  Mosaic compiles, so it's opt-in here.
* ``"xla_deferred"`` — the unpacked deferred variant (argmin + gather per
  bin round); kept for comparison.
* ``"xla"`` — ``lax.scan`` with an exact per-tile ``lax.top_k`` merge
  (ops.topk): the certified-exact path (no bin reduce), the portable
  fallback, and the automatic choice when the database is too small for a
  sound bin depth (ops.pallas_scan.choose_bin_top).

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
from hvq_tpu.ops.pallas_scan import (
    choose_bin_top,
    deferred_bin_scan_xla,
    deferred_packed_scan_xla,
    fused_packed_scan,
    kernel_bin_top,
)
from hvq_tpu.utils.formats import Dataset, QuerySet


def dispatch_plan(num_batches: int, dispatch_group: int) -> list[int]:
    """Group sizes for a query stream of ``num_batches`` batches.

    ``dispatch_group == 0`` → the whole stream as one group (small DBs).
    Otherwise greedy descending powers of two capped at ``dispatch_group``,
    so any stream length costs O(log) dispatches while only O(log) distinct
    program shapes ever compile (each dispatch pays a fixed host/relay
    round trip — the ThreadPool fork-join overhead analogue).
    """
    if num_batches <= 0:
        return []
    if dispatch_group == 0:
        return [num_batches]
    plan = []
    g = 1 << (dispatch_group.bit_length() - 1)   # largest power of 2 <= cap
    left = num_batches
    while left:
        while g > left:
            g >>= 1
        plan.append(g)
        left -= g
    return plan


def _default_scan_impl() -> str:
    # NOTE: the fused Pallas kernel (scan_impl="pallas") is the intended
    # default on TPU, but this build environment's axon relay hangs on any
    # Mosaic kernel compile (even a trivial one — verified 2026-08-16), so
    # the default is the same algorithm expressed in pure XLA with packed
    # distance+lane keys. Flip to "pallas" on a standard TPU runtime.
    return "xla_packed" if jax.devices()[0].platform == "tpu" else "xla"


class BatchedEngine:
    """TPU-native batched exact scan engine."""

    name = "batched"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int | None = None,
        query_batch: int | None = None,
        kprime: int = 128,
        dtype=jnp.float32,
        precision: str = "high",
        topk_strategy: str = "topk",
        scan_impl: str = "auto",
        interpret: bool | None = None,
        dispatch_group: int | None = None,
        device_db: DeviceDB | None = None,
    ):
        self.scan_impl = (
            _default_scan_impl() if scan_impl == "auto" else scan_impl
        )
        if db_tile is None:
            # 8192 rows/tile: XLA paths amortize per-step scan overhead; the
            # fused kernel gets out_w = 2·64 = 128 (Mosaic block constraint)
            # with the cheapest sound bin depth.
            db_tile = 8192
        self.db = device_db or DeviceDB.from_dataset(
            ds, db_tile=db_tile, dtype=dtype
        )
        if query_batch is None:
            # Wide batches amortize both per-dispatch latency AND the scan's
            # per-tile structural cost (measured: per-tile ≈ 21 µs + 0.22 µs
            # per query ⇒ per-query cost keeps falling through B=1024).
            query_batch = 1024
        self.query_batch = query_batch
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        self.topk_strategy = topk_strategy
        # R entries kept per 128-lane bin; None = no sound choice (small n,
        # or neighbor-clustered layouts) → certified-exact XLA path. The
        # Pallas kernel additionally needs R·(db_tile/128) % 128 == 0.
        if self.scan_impl == "pallas":
            self.bin_top = kernel_bin_top(self.db.db_tile, self.db.n_pad, kprime)
        else:
            self.bin_top = choose_bin_top(self.db.n_pad, kprime)
        if (
            self.scan_impl in ("pallas", "xla_deferred", "xla_packed")
            and self.bin_top is None
        ):
            self.scan_impl = "xla"
        # Pallas kernels need interpret mode off-TPU (CPU test meshes).
        self.interpret = (
            jax.devices()[0].platform != "tpu"
            if interpret is None
            else interpret
        )
        self.compute_dtype = dtype
        if dispatch_group is None:
            # Each dispatch costs a fixed host/relay round trip (measured
            # ~25-260 ms here) regardless of compute. Small databases run
            # the WHOLE query set as one device program (dispatch_group=0
            # sentinel). At scale, batches are greedily grouped into
            # descending powers of two up to this cap, so a query stream of
            # any length costs O(log) dispatches while only O(log) program
            # shapes ever compile.
            dispatch_group = 0 if self.db.n_pad <= (1 << 17) else 32
        self.dispatch_group = dispatch_group
        self._pos = jnp.arange(self.db.n_pad, dtype=jnp.int32)
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=kprime))
        self._search_jit = jax.jit(
            self._search_batch, static_argnames=("self_k",)
        )
        self._search_group_jit = jax.jit(
            self._search_group, static_argnames=("self_k",)
        )

    # --- jitted core -----------------------------------------------------
    def _search_batch(
        self,
        Vp, Cf, Tf, dnf,        # flat database arrays (n_pad, ...)
        qV, qtype, v, l, r,     # raw query batch arrays
        sn, n,                  # traced scalars
        self_k: int,
    ):
        from hvq_tpu.ops import masks as mask_ops

        active_c, vv, active_t, ll, rr = mask_ops.query_predicate_fields(
            qtype, v, l, r
        )
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        Dt = self.db.db_tile
        if self.scan_impl in ("pallas", "xla_deferred", "xla_packed"):
            if self.scan_impl == "pallas":
                out_s, out_i = fused_packed_scan(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=self.bin_top,
                    interpret=self.interpret,
                    precision=self.precision,
                )
            elif self.scan_impl == "xla_packed":
                out_s, out_i = deferred_packed_scan_xla(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=self.bin_top,
                    precision=self.precision,
                )
            else:
                out_s, out_i = deferred_bin_scan_xla(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=self.bin_top,
                    precision=self.precision,
                )
            kp = min(self.kprime, out_s.shape[1])
            top_neg, idx = jax.lax.top_k(-out_s, kp)
            scores = -top_neg
            ids = jnp.take_along_axis(out_i, idx, axis=1)
        else:
            nt = self.db.n_pad // Dt
            tiles = (
                Vp.reshape(nt, Dt, Vp.shape[-1]),
                Cf.reshape(nt, Dt),
                Tf.reshape(nt, Dt),
                dnf.reshape(nt, Dt),
            )
            scores, ids = common.scan_database(
                tiles, qb, sn,
                kprime=self.kprime, db_tile=Dt,
                precision=self.precision, strategy=self.topk_strategy,
                compute_dtype=self.compute_dtype,
            )
        return common.finalize(
            scores, ids, Vp, qb, n, self_k, tail_V=self.tail_V
        )

    def _search_group(self, Vp, Cf, Tf, dnf, qVg, qtypeg, vg, lg, rg, sn, n,
                      self_k: int):
        """G query batches in ONE dispatch (amortizes host→device latency,
        which measures ~75 ms per call through the axon relay)."""

        def step(_, xs):
            qV, qtype, v, l, r = xs
            return None, self._search_batch(
                Vp, Cf, Tf, dnf, qV, qtype, v, l, r, sn, n, self_k
            )

        _, (ids, dists) = jax.lax.scan(
            step, None, (qVg, qtypeg, vg, lg, rg)
        )
        return ids, dists

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
        B = self.query_batch

        Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
        qVp_all = pad_vectors_np(Vq.astype(np.float32), _c.PADDED_DIM)

        ids_out = np.empty((m_pad, k), dtype=np.uint32)
        dists_out = np.empty((m_pad, k), dtype=np.float32)
        db_args = (self.db.Vp, self.db.C, self.db.T, self.db.d_norms)
        # Enqueue every dispatch without fetching (device results are tiny);
        # host→device uploads of group i+1 then overlap compute of group i,
        # and the relay's per-call latency pipelines instead of serializing.
        pending = []
        s = 0
        for G in dispatch_plan(m_pad // B, self.dispatch_group):
            if G > 1:
                # grouped dispatch: G batches in one device call
                e = s + G * B
                grp = lambda a: jnp.asarray(a[s:e].reshape(G, B, *a.shape[1:]))
                ids_b, d_b = self._search_group_jit(
                    *db_args,
                    grp(qVp_all), grp(qtype), grp(v), grp(l), grp(r),
                    sn, n_t, self_k=k,
                )
            else:
                e = s + B
                ids_b, d_b = self._search_jit(
                    *db_args,
                    jnp.asarray(qVp_all[s:e]),
                    jnp.asarray(qtype[s:e]),
                    jnp.asarray(v[s:e]),
                    jnp.asarray(l[s:e]),
                    jnp.asarray(r[s:e]),
                    sn, n_t, self_k=k,
                )
            pending.append((s, e, ids_b, d_b))
            s = e
        for s, e, ids_b, d_b in pending:
            ids_out[s:e] = np.asarray(ids_b).reshape(e - s, k)
            dists_out[s:e] = np.asarray(d_b).reshape(e - s, k)
        return ids_out[: qs.m], dists_out[: qs.m]
