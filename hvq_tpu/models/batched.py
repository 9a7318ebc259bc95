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

Exactness certificate (``certified=True``, the default): the deferred bin
scan keeps the best R candidates per 128-lane bin, which loses a true
neighbor only if R+1 of the top-k' share one bin. Rather than relying on
the Poisson tail bound alone, every batch carries a device-computed
certificate: with t = the k-th refined distance, a bin can conceal a
better-than-t row only if its R-th (worst) kept quantized distance is
below t plus a rigorous fp-slack (matmul-accumulation + key-quantization
error bounds, see ``_CERT_*`` below); the k'-cut is checked the same way.
BENIGN saturation (two of the top-k' sharing a bin by Poisson chance —
~6% of queries at D=10⁷/R=2) can be repaired IN-PROGRAM: the
``repair_bins`` most-saturated bins' 128 rows are appended to the
exact-refine candidate set (common.bin_repair_candidates), so the bin
term of the certificate becomes "the (rb+1)-th most-saturated bin is
still under threshold" and the flag rate drops to adversarial cases only.
Suspect flags ride back to the host with the ids (1 byte/query), and
suspect batches are re-run through a compacted ladder (deeper-bin rung,
then the certified-exact ``lax.top_k`` streaming path; one lazily-compiled
program, pow-2-compacted batch shapes). This makes the fast packed path
EXACT at every database size, replacing the old small-DB fallback to the
slow path. The DEFAULT is ``repair_bins=0`` (rerun-only): the in-program
repair's gather + widened refine costs ~19 ms on EVERY batch while the
rerun wall for the same suspects is ~4 ms/batch — measured 16238 → 23109
QPS at D=10⁶ and 8535 → 8987 at D=10⁷ on the bf16 plane
(experiments/v3_tail_sweep.py, experiments/flagship_ab.py, r4). The
in-program repair stays available for latency-sensitive serving where the
rerun's extra host round-trip matters more than throughput.

Scan implementations (``scan_impl``; measured ladder in CHANGELOG.md):

* ``"xla_packed"`` (default on TPU) — deferred top-R-per-bin selection with
  packed distance+lane int32 keys: one min-reduce per bin round, candidate
  positions recovered arithmetically, one ``lax.top_k`` per batch. 14× the
  streaming-top-k path at 10⁶ rows; ~8× the exact path at 10⁴ rows.
* ``"pallas"`` / ``"pallas_v2"`` — fused Mosaic kernels (ops.pallas_scan):
  same algorithm with the (B, Dt) score tile living only in VMEM. v2 fixes
  v1's silent 6-pass-fp32 matmul (Mosaic has no Precision.HIGH) with a
  manual 3-pass bf16 expression and B-subtiling — 4.7× faster than v1,
  yet still ~2× behind XLA's own fusion of the identical algorithm
  (measured 54.8 vs 26.6 ms/batch at B=1024, 10⁶ rows). XLA wins here;
  the kernels stay as differential references and options.
* ``"xla_deferred"`` — the unpacked deferred variant (argmin + gather per
  bin round); kept for comparison.
* ``"xla"`` — ``lax.scan`` with an exact per-tile ``lax.top_k`` merge
  (ops.topk): the certified-exact path with no bin reduce at all — the
  portable fallback and the certificate's rerun target.

Host↔device traffic is engineered for the measured relay costs (each
transfer pays ~40-150 ms fixed + ~35-70 MB/s): queries ship as ONE packed
(B, 132) array ([vector₁₂₈ | type | v | l | r], one upload instead of
five), and ``search(return_dists=False)`` fetches only the ids — the
reference's ``vec_query`` contract is also ids-only, with the .dist file
recomputed host-side afterwards (src/test.cpp:95-110, io.h:50-78). Result
ids pack 2-per-lane at 16 bits (n ≤ 65535) or 4-per-3-lanes at 24 bits
(n ≤ 2²⁴), shrinking the fetch 50%/25% (see :func:`id_pack_mode`).

``scan_store="bf16"`` keeps a rounded bf16 copy of the database that ONLY
the selection matmul reads (one true-bf16 MXU pass instead of the 3-pass
decomposition, half the scan bytes; +50% HBM) while refinement keeps
gathering exact fp32 rows — so the mode stays CERTIFIED, with the widened
``_CERT_REL_MM_BF16`` slack and a wider default k' (256). This is the
certified successor of the old uncertified bf16 fast mode
(``dtype=bfloat16``), which remains for memory-constrained use.

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
    BIN,
    choose_bin_top,
    deferred_bin_scan_xla,
    deferred_packed_scan_xla,
    fused_packed_scan,
    kernel_bin_top,
    last_round_dists,
    v3_query_block,
)
from hvq_tpu.utils.formats import Dataset, QuerySet

# Packed query-block layout: [vector (VEC_DIM) | qtype | v | l | r] — the
# reference's own 104-float query record, reordered (write_query.c:28-58).
# Vectors are zero-padded to PADDED_DIM on DEVICE: uploading the raw 104
# floats instead of padded-128 + 4 separate arrays cuts the relay upload
# ~25% and five round trips to one.
QPACK_W = _c.VEC_DIM + 4

# Exactness-certificate slack terms (see class docstring). The selection
# distance dn + ‖q‖² − 2·q·d is computed with ≥3-pass-bf16 matmuls and a
# fp32 accumulation over ≤128 lanes whose reduction ORDER XLA/Mosaic does
# not contractually fix. The bound must therefore cover the WORST order —
# fully sequential: |err(Σxᵢyᵢ)| ≤ 128·2⁻²⁴·Σ|xᵢyᵢ| ≈ 7.63e-6·‖q‖‖d‖
# (a balanced tree would give log₂128·2⁻²⁴ ≈ 4.2e-7). With the 2× factor
# on the cross term, bf16 3-pass product error (≲2⁻²¹ per product) and the
# final dn + (−2q·d) add, the total is ≲ 8.2e-6·(‖q‖²+max‖d‖²); the
# constant below carries ~2× margin on top. The packed key truncates 7
# mantissa bits (2⁻¹⁶ relative, rounding DOWN — quantized ≤ true); the
# refined threshold t carries ≤128·2⁻²⁴ relative error itself. An
# adversarial near-threshold stress test sweeps this boundary in
# tests/test_certificate.py::test_certificate_slack_boundary_stress.
_CERT_REL_MM = 1.6e-5    # × (‖q‖² + max ‖d‖²)
_CERT_REL_T = 2.0 ** -13   # × t  (covers key quantization ×8 margin)
_CERT_ABS = 1e-6
# bf16 SCAN-plane mode (scan_store="bf16"): the selection matmul reads a
# rounded bf16 copy of the database with bf16 query inputs — one true MXU
# pass, half the scan bytes. Each operand carries ≤2⁻⁹ relative rounding,
# so |q·d − q̂·d̂| ≤ 2·2⁻⁹·‖q‖‖d‖ (+ the fp32 accumulation term already
# below 2⁻¹⁶); the dist's 2× cross-term factor gives
# |err| ≤ 2⁻⁷·‖q‖‖d‖ ≤ 2⁻⁸·(‖q‖² + max‖d‖²). The constant carries 2×
# margin. Refinement still gathers exact fp32 rows, so the widened slack
# affects only the FLAG RATE, never reported distances; k' defaults wider
# (256) in this mode so the k'-cut boundary clears the bigger envelope.
_CERT_REL_MM_BF16 = 8e-3   # × (‖q‖² + max ‖d‖²), ≈ 2×·2⁻⁸


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


def pack_query_block(qV: np.ndarray, qtype, v, l, r) -> np.ndarray:
    """Host-side: one (m, QPACK_W) float32 block = one relay upload."""
    m = qV.shape[0]
    out = np.empty((m, QPACK_W), np.float32)
    out[:, : _c.VEC_DIM] = qV[:, : _c.VEC_DIM]
    out[:, _c.VEC_DIM] = qtype               # 0..3, exact in fp32
    out[:, _c.VEC_DIM + 1] = v
    out[:, _c.VEC_DIM + 2] = l
    out[:, _c.VEC_DIM + 3] = r
    return out


def id_pack_mode(n: int, k: int) -> str:
    """Fetch packing for result ids: "16" (2 ids/lane, n ≤ 65535),
    "24" (4 ids per 3 lanes, n ≤ 2²⁴, k % 4 == 0 — the 10⁷-row sets), or
    "none"."""
    if n <= 0xFFFF and k % 2 == 0:
        return "16"
    if n <= 0xFFFFFF and k % 4 == 0:
        return "24"
    return "none"


def bundle_ids(ids, suspect, pack_mode: str):
    """One fetched int32 tensor per batch: [packed ids | certificate bit].

    Ids pack two-per-lane at 16 bits (halves the fetch) or four-per-three-
    lanes at 24 bits (−25%, the D=10⁷ sets — the id fetch is ~11% of the
    large-set wall); the suspect flag rides as a final column instead of
    its own device array (each separate fetch costs a ~27 ms relay round
    trip). Shared by the batched and sharded engines — the packing scheme
    must stay in ONE place (inverse: :func:`unbundle_ids`).
    """
    # Invariant: every id is a database position < n_pad, and callers gate
    # the mode on n_pad (id_pack_mode) so ids always fit the field width.
    # The mask makes the packed domain explicit: a violated invariant
    # corrupts only the offending id instead of bleeding into its
    # neighbors' bits through the shifts below.
    if pack_mode == "16" and ids.shape[-1] % 2 == 0:
        ids = ids & 0xFFFF
        ids = ids[..., 0::2] | (ids[..., 1::2] << 16)
    elif pack_mode == "24" and ids.shape[-1] % 4 == 0:
        ids = ids & 0xFFFFFF
        i0, i1, i2, i3 = (ids[..., j::4] for j in range(4))
        ids = jnp.concatenate(
            [
                i0 | (i1 << 24),
                ((i1 >> 8) & 0xFFFF) | (i2 << 16),
                ((i2 >> 16) & 0xFF) | (i3 << 8),
            ],
            axis=-1,
        )
    return jnp.concatenate(
        [ids, suspect.astype(jnp.int32)[..., None]], axis=-1
    )


def unbundle_ids(arr: np.ndarray, k: int, pack_mode: str):
    """Host-side inverse of :func:`bundle_ids`: (ids (..., k), suspect)."""
    ids_np, suspect = arr[..., :-1], arr[..., -1].astype(bool)
    if pack_mode == "16" and k % 2 == 0:
        u = ids_np.astype(np.uint32)
        out = np.empty((*ids_np.shape[:-1], k), np.uint32)
        out[..., 0::2] = u & 0xFFFF
        out[..., 1::2] = u >> 16
        ids_np = out
    elif pack_mode == "24" and k % 4 == 0:
        u = ids_np.astype(np.uint32)
        g = k // 4
        w0, w1, w2 = u[..., :g], u[..., g : 2 * g], u[..., 2 * g :]
        out = np.empty((*ids_np.shape[:-1], k), np.uint32)
        out[..., 0::4] = w0 & 0xFFFFFF
        out[..., 1::4] = (w0 >> 24) | ((w1 & 0xFFFF) << 8)
        out[..., 2::4] = (w1 >> 16) | ((w2 & 0xFF) << 16)
        out[..., 3::4] = w2 >> 8
        ids_np = out
    return ids_np, suspect


def packed_id_width(k: int, pack_mode: str) -> int:
    """Lane count of the packed id block (excluding the certificate bit)."""
    if pack_mode == "16" and k % 2 == 0:
        return k // 2
    if pack_mode == "24" and k % 4 == 0:
        return 3 * (k // 4)
    return k


def _pow2_batch(m: int, cap: int) -> int:
    """Smallest pow-2 rerun program shape >= m (min 64, capped at ``cap``).

    Rerun rungs scan the full view regardless of batch width, but the
    matmul/epilogue cost scales with B — a handful of suspects should not
    pay a query_batch-shaped program. Pow-2 snapping bounds the number of
    compiled shapes to {64,128,...,cap}.
    """
    B = 64
    while B < m and B < cap:
        B *= 2
    return min(B, cap)


def rerun_suspect_ladder(
    suspects, ids_raw, dists_out, B, kw, k, deeper, run
):
    """Compacted certificate-escalation ladder (batched + sharded engines).

    Flagged queries are gathered into fresh batches (S scattered suspects
    cost ceil(S/B) extra runs, not one per touched batch), re-run at the
    ``deeper`` bin depth, and any still-suspect queries go through the
    streaming exact path. ``run(sel, impl, bin_top)`` executes one batch of
    the query indices ``sel`` and returns (bundle, dists) device arrays;
    results scatter back into ``ids_raw``/``dists_out`` by index.
    """
    idx = np.nonzero(suspects)[0]

    def batches(indices):
        # pow-2-compacted program shapes: a handful of suspects runs a
        # B=64 program, not a query_batch-shaped one (the scan still
        # covers the full view, but matmul/epilogue cost scales with B)
        for s in range(0, indices.size, B):
            sel0 = indices[s : s + B]
            Br = _pow2_batch(sel0.size, B)
            pad = Br - sel0.size
            yield sel0, np.concatenate([sel0, np.repeat(sel0[:1], pad)]), Br

    still_q = []
    if deeper is not None:
        for sel0, sel, Br in batches(idx):
            b_b, d_b = run(sel, "xla_packed", deeper)
            common.prefetch_host((b_b, d_b) if dists_out is not None else (b_b,))
            b_np = np.asarray(b_b).reshape(Br, kw)[: sel0.size]
            fixed = b_np[:, -1] == 0
            ids_raw[sel0[fixed]] = b_np[fixed][:, :-1]
            if dists_out is not None:
                dists_out[sel0[fixed]] = np.asarray(d_b).reshape(Br, k)[
                    : sel0.size
                ][fixed]
            still_q.append(sel0[~fixed])
    else:
        still_q.append(idx)
    idx2 = np.concatenate(still_q) if still_q else idx[:0]
    for sel0, sel, Br in batches(idx2):
        b_b, d_b = run(sel, "xla", None)
        common.prefetch_host((b_b, d_b) if dists_out is not None else (b_b,))
        b_np = np.asarray(b_b).reshape(Br, kw)[: sel0.size]
        ids_raw[sel0] = b_np[:, :-1]
        if dists_out is not None:
            dists_out[sel0] = np.asarray(d_b).reshape(Br, k)[: sel0.size]


def _default_scan_impl() -> str:
    # pallas_v3 (sublane-axis bin rounds, score tile resident in VMEM) is
    # the round-3 measured winner: 16946 vs xla_packed's 11157 QPS at
    # D=10⁶/B=1024, bit-identical results (CHANGELOG r3). v1/v2's losses
    # to XLA fusion traced to lane-axis reduces — fixed in v3; they remain
    # available as scan_impl="pallas"/"pallas_v2" with their write-ups.
    return "pallas_v3" if jax.devices()[0].platform == "tpu" else "xla"


class BatchedEngine:
    """TPU-native batched exact scan engine."""

    name = "batched"

    def __init__(
        self,
        ds: Dataset,
        db_tile: int | None = None,
        query_batch: int | None = None,
        kprime: int | None = None,
        dtype=jnp.float32,
        precision: str = "high",
        topk_strategy: str = "topk",
        scan_impl: str = "auto",
        interpret: bool | None = None,
        dispatch_group: int | None = None,
        device_db: DeviceDB | None = None,
        certified: bool = True,
        bin_top: int | None = None,
        l2_min_w: int = 16384,
        scan_layout: str = "axis1",
        repair_bins: int = 0,
        repair_gate: bool = False,
        scan_store: str = "fp32",
        v3_b_block: int = 256,
    ):
        self.scan_impl = (
            _default_scan_impl() if scan_impl == "auto" else scan_impl
        )
        # Bin membership layout of the packed scan: "axis1" (strided
        # groups, sublane reduce — measured 25% faster, rounds ~1.2 ms
        # each) or "lane" (contiguous groups, lane reduce). Constructor-
        # only; see ops.pallas_scan.deferred_packed_scan_xla.
        # the v3 kernel's epilogue IS the axis1 layout (sublane rounds,
        # pos = tile·Dt + slice·bins + bin): repair/level-2 decode must match
        if self.scan_impl == "pallas_v3":
            scan_layout = "axis1"
        self.scan_layout = scan_layout
        # v3 kernel query sub-block (VMEM working set knob)
        self.v3_b_block = int(v3_b_block)
        # In-program bin-repair width (constructor-only, baked into the
        # traced program; 0 disables — see common.bin_repair_candidates)
        self.repair_bins = int(repair_bins)
        self.repair_gate = bool(repair_gate)
        # Certificate forensics (HVQ_CERT_TERMS=1 before construction):
        # same bitmask semantics as PartitionedEngine (1 = bin/residual,
        # 2 = level-2, 4 = k'-cut); nonzero still reads as suspect.
        import os as _os

        self._cert_debug = _os.environ.get("HVQ_CERT_TERMS") == "1"
        self._last_cert_terms: np.ndarray | None = None
        if db_tile is None:
            # 8192 rows/tile: XLA paths amortize per-step scan overhead; the
            # fused kernel gets out_w = 2·64 = 128 (Mosaic block constraint)
            # with the cheapest sound bin depth. The v3 kernel reshapes the
            # epilogue to (B, 128, Dt/128) and wants a full 128-lane minor
            # axis, hence 16384.
            db_tile = 16384 if self.scan_impl == "pallas_v3" else 8192
        elif (
            self.scan_impl == "pallas_v3"
            and scan_impl == "auto"
            and (db_tile // BIN) % 128
        ):
            # auto picked v3 but the caller pinned a tile too small for the
            # (B, 128, Dt/128) epilogue reshape — use the XLA twin instead
            self.scan_impl = "xla_packed"
        self.db = device_db or DeviceDB.from_dataset(
            ds, db_tile=db_tile, dtype=dtype, scan_store=scan_store
        )
        # A provided device_db decides the scan plane itself.
        self._bf16_scan = self.db.V_scan is not None
        if query_batch is None:
            # Wide batches amortize both per-dispatch latency AND the scan's
            # per-tile structural cost (measured: per-tile ≈ 21 µs + 0.22 µs
            # per query ⇒ per-query cost keeps falling through B=1024).
            query_batch = 1024
        self.query_batch = query_batch
        if kprime is None:
            # bf16 scan plane: the certificate slack widens ~500× (see
            # _CERT_REL_MM_BF16); a wider k' keeps the k'-cut boundary —
            # the 128th-best selection score — clear of t + slack so the
            # k'-cut term stays quiet on typical layouts. 240, not 256:
            # k'=256 pays a selection-stage cliff worth 13-15% QPS at
            # D=10⁷ (two sessions, experiments/flagship_tune.py: 8809/8686
            # at k'=240/224 vs 7687 at 256, rerun phase flat — R is 3 for
            # every k' in 192-256, so slack behavior is unchanged), while
            # k'≤208 approaches the measured rerun-storm cliff (k'=192
            # melted down to 4357 QPS, experiments/flagship_ab.py).
            kprime = 240 if self._bf16_scan else 128
        self.kprime = kprime
        self.precision = resolve_precision(precision)
        # bf16 scan inputs take one true MXU pass; the precision knob only
        # decomposes fp32 operands.
        self._scan_precision = (
            jax.lax.Precision.DEFAULT if self._bf16_scan else self.precision
        )
        self.topk_strategy = topk_strategy
        # The certificate's error model assumes ≥3-pass matmul selection on
        # fp32 storage — or the bf16 scan plane's own widened envelope
        # (refinement stays fp32 either way). The bf16 fast-mode
        # (dtype=bfloat16 PRIMARY storage) remains approximate by design
        # (recall-gated rather than certified).
        self.certified = bool(
            certified
            and dtype == jnp.float32
            and (
                self._bf16_scan
                or self.precision
                in (jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST)
            )
        )
        self._rel_mm = _CERT_REL_MM_BF16 if self._bf16_scan else _CERT_REL_MM
        # R entries kept per 128-lane bin. Certified mode picks R for a tiny
        # fallback RATE (correctness comes from the certificate); legacy mode
        # demands the Poisson loss bound outright and may return None
        # (→ certified-exact XLA path). An explicit ``bin_top`` overrides
        # the choice (constructor-only: it is baked into jit cache keys).
        if bin_top is not None:
            self.bin_top = bin_top
        elif self.scan_impl == "pallas_v3":
            # v3's out_w = R·(Dt/128) is 128-aligned whenever Dt ≥ 16384,
            # so the plain Poisson choice applies unrounded.
            self.bin_top = choose_bin_top(
                self.db.n_pad, kprime, certified=self.certified
            )
        elif self.scan_impl in ("pallas", "pallas_v2"):
            self.bin_top = kernel_bin_top(
                self.db.db_tile, self.db.n_pad, kprime,
                certified=self.certified,
            )
        else:
            self.bin_top = choose_bin_top(
                self.db.n_pad, kprime, certified=self.certified
            )
        if (
            self.scan_impl
            in ("pallas", "pallas_v2", "pallas_v3", "xla_deferred",
                "xla_packed")
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
            # ~25-260 ms here) regardless of compute; dispatches are async,
            # so a SHORT group chain lets result fetches of group i overlap
            # compute of group i+1 while still paying only O(log)
            # dispatches. Small databases use pairs: the r4 whole-set-as-
            # one-program default (dispatch_group=0) serialized upload →
            # all compute → fetch, and measured 35.5k QPS at D=10⁴/Q=10⁴
            # against 49.5k for pairs — 110% of the session's wire floor
            # (experiments/default_pipeline_ab.py, VERDICT r4 #2). At
            # scale, batches are greedily grouped into descending powers
            # of two up to this cap, so a query stream of any length costs
            # O(log) dispatches while only O(log) program shapes compile.
            dispatch_group = 2 if self.db.n_pad <= (1 << 17) else 32
        self.dispatch_group = dispatch_group
        self._pos = jnp.arange(self.db.n_pad, dtype=jnp.int32)
        self.tail_V = jnp.asarray(common.tail_block_np(ds.V, t=kprime))
        # max ‖d‖² for the certificate's matmul-error term (build-time sync).
        self._dn_max = (
            float(jnp.max(self.db.d_norms)) if self.certified else 0.0
        )
        # Two ids per int32 lane when they fit 16 bits (halves the id fetch).
        # Gated on n_pad, not n: every id that can reach bundle_ids is a
        # database position < n_pad (finalize's tail pads are < n and DB pad
        # rows are masked, but gating on the padded width makes the packed
        # representation cover every representable position by construction).
        self._id_mode = id_pack_mode(self.db.n_pad, _c.K_DEFAULT)
        # Candidate streams at least this wide go through the 2nd-level
        # packed reduce before the final top_k. Round-1 (lane layout +
        # transpose) was net-negative at the medium set's W=23616; the
        # axis1 transpose-free form measured +5% there (16839 → 17727
        # QPS) and +12% at the large set, so the gate now matches the
        # soundness floor (W >= 16384 = bins2 >= 128). Constructor-only:
        # baked into the traced program at first compile.
        self.l2_min_w = l2_min_w
        self._search_jit = jax.jit(
            self._search_batch,
            static_argnames=("self_k", "impl", "bin_top", "level2"),
        )
        self._search_group_jit = jax.jit(
            self._search_group,
            static_argnames=("self_k", "impl", "bin_top", "level2"),
        )

    # --- jitted core -----------------------------------------------------
    def _search_batch(
        self,
        Vp, Vs, Cf, Tf, dnf,    # flat database arrays (n_pad, ...); Vs =
        #                         the scan plane (== Vp unless bf16 mode)
        Qblk,                   # (B, QPACK_W) packed query block
        sn, n,                  # traced scalars
        self_k: int,
        impl: str | None = None,
        bin_top: int | None = None,
        level2: bool = True,
    ):
        from hvq_tpu.ops import masks as mask_ops

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
        qb = common.QueryBatch(qV, active_c, vv, active_t, ll, rr)
        Dt = self.db.db_tile
        nt = self.db.n_pad // Dt
        if impl in ("pallas", "pallas_v2", "pallas_v3", "xla_deferred",
                    "xla_packed"):
            if impl == "pallas":
                out_s, out_i = fused_packed_scan(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    interpret=self.interpret,
                    precision=self.precision,
                )
            elif impl == "pallas_v2":
                from hvq_tpu.ops.pallas_scan import fused_packed_scan_v2

                out_s, out_i = fused_packed_scan_v2(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    b_block=v3_query_block(B, 256),
                    interpret=self.interpret,
                )
            elif impl == "pallas_v3":
                from hvq_tpu.ops.pallas_scan import fused_packed_scan_v3

                out_s, out_i = fused_packed_scan_v3(
                    Vs, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    b_block=v3_query_block(B, self.v3_b_block),
                    interpret=self.interpret,
                )
            elif impl == "xla_packed":
                out_s, out_i = deferred_packed_scan_xla(
                    Vs, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    precision=self._scan_precision,
                    layout=self.scan_layout,
                )
            else:
                out_s, out_i = deferred_bin_scan_xla(
                    Vp, Cf, Tf, dnf, self._pos,
                    qV, active_c, vv, active_t, ll, rr, sn,
                    db_tile=Dt, bin_top=bin_top,
                    precision=self.precision,
                )
            W = out_s.shape[1]
            kp = min(self.kprime, W)
            worst2 = None
            # Level-2 gates. LANE layout: the explicit transpose needs
            # nt >= 128 (fewer tiles aggregate the round-0 per-bin bests —
            # measured recall 0.4 when forced at nt=30). AXIS1 layout:
            # strided bins interleave the stream at any nt, but the BIN
            # COUNT must keep the Poisson load light — W >= 16384 gives
            # bins2 >= 128, so lam = kp/bins2 <= 1 and keep-8 loses
            # < 1.4e-4/query (measured 8e-4 recall loss when forced at
            # bins2 = 30 uncertified).
            l2_ok = (
                W >= 16384
                if self.scan_layout == "axis1"
                else nt >= 128
            )
            if level2 and W >= self.l2_min_w and l2_ok:
                # 2nd-level packed reduce: the candidate top_k is the tail's
                # main cost at wide streams (experiments/topk_tail.py);
                # worst2 joins the certificate below, and nt= decorrelates
                # the bins from tiles (see binned_stream_topk). Reruns pass
                # level2=False: one batch's plain top_k is cheap and
                # certifies harder.
                from hvq_tpu.ops.topk import binned_stream_topk

                scores, ids, worst2 = binned_stream_topk(
                    out_s, out_i, kp, nt=nt, layout=self.scan_layout
                )
            else:
                top_neg, idx = jax.lax.top_k(-out_s, kp)
                scores = -top_neg                   # ascending quantized
                ids = jnp.take_along_axis(out_i, idx, axis=1)
            # k'-cut boundary estimate BEFORE repair widens the candidates
            kcut_score = scores[:, kp - 1] if kp < W else None
            remaining_min = None
            if (
                self.certified
                and self.repair_bins
                and impl in ("xla_packed", "pallas_v3")
            ):
                # in-program bin repair (common.bin_repair_candidates):
                # rows are original-order here, so positions double as ids
                # and self._pos is the sample-mask array the scan used.
                # thr_pre gates the scattered gather to saturated bins
                # (k-th candidate estimate + doubled slack ≥ final thr)
                thr_pre = (
                    common.repair_thr_pre(
                        scores, self_k, qV, self._dn_max,
                        self._rel_mm, _CERT_REL_T, _CERT_ABS,
                    )
                    if self.repair_gate
                    else None
                )
                scores, ids, remaining_min = common.bin_repair_candidates(
                    out_s, scores, ids, nt, bin_top, Dt // BIN,
                    Dt, self.scan_layout, Cf, Tf, self._pos, qb, sn,
                    self.repair_bins, thr_pre=thr_pre,
                )
            f_ids, f_d = common.finalize(
                scores, ids, Vp, qb, n, self_k, tail_V=self.tail_V
            )
            if self.certified:
                # Certificate: nothing outside the kept candidates can beat
                # the k-th refined distance t (see module docstring).
                t = f_d[:, self_k - 1]
                qnorm = jnp.sum(qV.astype(jnp.float32) ** 2, axis=1)
                slack = (
                    self._rel_mm * (qnorm + self._dn_max)
                    + _CERT_REL_T * t
                    + _CERT_ABS
                )
                thr = t + slack
                if remaining_min is not None:
                    # bin term after repair: the (rb+1)-th most-saturated
                    # bin is the only one that can still hide a candidate
                    t_bin = remaining_min < thr
                else:
                    worst = last_round_dists(
                        out_s, nt, bin_top, Dt // BIN
                    )                                # (B, nt·bins)
                    t_bin = jnp.min(worst, axis=1) < thr
                t_l2 = (worst2 < thr) if worst2 is not None else None
                # the k'-cut also discards candidates; its boundary must
                # clear t the same way
                t_kc = (
                    (kcut_score < thr) if kcut_score is not None else None
                )
                suspect = common.cert_suspect(
                    t_bin, t_l2, t_kc, self._cert_debug
                )
            else:
                suspect = jnp.zeros((B,), bool)
            return self._bundle(f_ids, suspect), f_d
        # certified-exact streaming path (per-tile lax.top_k merge)
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
        f_ids, f_d = common.finalize(
            scores, ids, Vp, qb, n, self_k, tail_V=self.tail_V
        )
        return self._bundle(f_ids, jnp.zeros((B,), bool)), f_d

    def _bundle(self, ids, suspect):
        return bundle_ids(ids, suspect, self._id_mode)

    def _unbundle(self, arr: np.ndarray, k: int):
        return unbundle_ids(arr, k, self._id_mode)

    def _search_group(self, Vp, Vs, Cf, Tf, dnf, Qblk_g, sn, n,
                      self_k: int, impl: str | None = None,
                      bin_top: int | None = None, level2: bool = True):
        """G query batches in ONE dispatch (amortizes host→device latency,
        which measures ~75 ms per call through the axon relay)."""

        def step(_, Qblk):
            return None, self._search_batch(
                Vp, Vs, Cf, Tf, dnf, Qblk, sn, n, self_k, impl, bin_top,
                level2,
            )

        _, (bundle, dists) = jax.lax.scan(step, None, Qblk_g)
        return bundle, dists

    # --- host driver -----------------------------------------------------
    def search(
        self,
        qs: QuerySet,
        k: int = _c.K_DEFAULT,
        sample_proportion: float = 1.0,
        return_dists: bool = True,
        phases=None,
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """Run the query set; returns (ids (m, k) uint32, dists (m, k) fp32).

        ``return_dists=False`` skips the distance fetch — the reference's
        ``vec_query`` contract is ids-only too (optimized_impl.h:392-437);
        .dist files are recomputed from ids afterwards (io.h:50-78) via
        formats.recompute_result_distances.

        ``phases``: optional PhaseTimer receiving the in-search breakdown
        (upload / enqueue / fetch / rerun), the driver-visible analogue of
        the reference's dist/check/sort/merge dump (optimized.hpp:133-145).
        Through an async relay, ``enqueue`` is dispatch cost and ``fetch``
        is where compute+transfer wait lands.
        """
        from hvq_tpu.utils.timing import maybe_phase

        n = self.db.n
        sn = jnp.int32(int(sample_proportion * n))
        n_t = jnp.int32(n)
        B = self.query_batch

        with maybe_phase(phases, "search/pack"):
            Vq, qtype, v, l, r, m_pad = common.pad_query_arrays(qs, B)
            Qpack = pack_query_block(Vq.astype(np.float32), qtype, v, l, r)
        with maybe_phase(phases, "search/upload"):
            Q_dev = jax.device_put(Qpack)         # ONE relay upload

        kw = packed_id_width(k, self._id_mode) + 1
        bundle_raw = np.empty((m_pad, kw), dtype=np.int32)
        dists_out = (
            np.empty((m_pad, k), dtype=np.float32) if return_dists else None
        )
        db_args = (
            self.db.Vp, self.db.scan_V, self.db.C, self.db.T,
            self.db.d_norms,
        )
        # Enqueue every dispatch without fetching (device results are tiny);
        # host→device uploads of group i+1 then overlap compute of group i,
        # and the relay's per-call latency pipelines instead of serializing.
        pending = []
        s = 0
        with maybe_phase(phases, "search/enqueue"):
            for G in dispatch_plan(m_pad // B, self.dispatch_group):
                if G > 1:
                    e = s + G * B
                    b_b, d_b = self._search_group_jit(
                        *db_args, Q_dev[s:e].reshape(G, B, QPACK_W),
                        sn, n_t, self_k=k,
                    )
                else:
                    e = s + B
                    b_b, d_b = self._search_jit(
                        *db_args, Q_dev[s:e], sn, n_t, self_k=k,
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
                    Qpack, suspects, ids_raw, dists_out, sn, n_t, k, kw, B
                )
        ids_out, _ = self._unbundle(bundle_raw, k)
        return (
            ids_out[: qs.m].astype(np.uint32),
            dists_out[: qs.m] if return_dists else None,
        )

    def _rerun_suspects(
        self, Qpack, suspects, ids_raw, dists_out, sn, n_t, k, kw, B
    ):
        """Re-run the queries whose exactness certificate failed.

        Suspects are COMPACTED into fresh query batches first (flagged
        queries scattered across the whole set cost ceil(S/B) extra batch
        runs, not one rerun per touched batch). The flag rate is the bin
        SATURATION rate bins·P(Pois(k/bins) ≥ R) — ~0.3% of queries at
        D=10⁶/R=3, ~6% at D=10⁷/R=2 (experiments/suspect_anatomy.py
        measured 31/10⁴ vs the model's 27) — almost all benign: an actual
        loss needs ≥ R+1 in one bin (~1e-5). Escalation ladder per
        compacted batch (see :func:`rerun_suspect_ladder`; all programs
        lazily compiled):

        1. the packed scan again at 2× the bin depth — conditional
           re-flag P(X ≥ 2R | X ≥ R) ≲ 1e-7 on Poisson layouts, and the
           candidate-stream memory stays ~2× the fast path's (4R at
           D=10⁷ would allocate ~5 GB next to the 5 GB database); then
        2. the streaming lax.top_k path (impl="xla" — no bin reduce,
           certified by construction) for queries still suspect after the
           deeper scan (adversarial bin-concentrated layouts).
        """
        deeper = None
        if self.scan_impl in (
            "pallas", "pallas_v2", "pallas_v3", "xla_packed", "xla_deferred"
        ):
            d = min(2 * self.bin_top, BIN)
            deeper = d if d > self.bin_top else None
        db_args = (
            self.db.Vp, self.db.scan_V, self.db.C, self.db.T,
            self.db.d_norms,
        )

        def run(sel, impl, bin_top):
            return self._search_jit(
                *db_args, jax.device_put(Qpack[sel]), sn, n_t,
                self_k=k, impl=impl, bin_top=bin_top, level2=False,
            )

        rerun_suspect_ladder(
            suspects, ids_raw, dists_out, B, kw, k, deeper, run
        )
