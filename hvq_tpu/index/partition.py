"""Category-partitioned / timestamp-sorted index layouts.

The capability the reference lacks but the north star demands
(SURVEY.md §7 stage 5, BASELINE.json config 3): reorder the database so the
predicate of each query type maps to a *contiguous row range* of a sorted
view, computed by binary search on the host, and only the database tiles
overlapping that range are scanned on device.

Two views (each ~1 database copy; both fit in HBM beside each other for the
10M contest set):

* ``cat_view`` — rows sorted by (C, T). Type-1 queries (``C == v``) become
  the partition range of ``v``; type-3 queries narrow that partition further
  by binary search on its (sorted) timestamps. Type-0 queries scan the whole
  view (no pruning possible — and none needed).
* ``time_view`` — rows sorted by T globally. Type-2 queries
  (``l <= T <= r``) become one contiguous range.

Index build never looks at query vectors (reference README.md:68's
prohibition); it is a pure permutation of D plus sort keys kept on the host
for ``searchsorted``. Original ids ride along as an ``oid`` column so results
(and the reference's original-file-order ``sample_proportion`` limit,
optimized.hpp:85) stay in the original id space.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c

from hvq_tpu.utils.formats import Dataset


@dataclasses.dataclass
class SortedView:
    """One reordered device-resident database copy + host sort keys."""

    # device arrays, rows padded to a multiple of db_tile
    Vp: jnp.ndarray       # (n_pad, 128)
    C: jnp.ndarray        # (n_pad,)
    T: jnp.ndarray        # (n_pad,)
    d_norms: jnp.ndarray  # (n_pad,)
    oid: jnp.ndarray      # (n_pad,) int32 original ids (padding rows: n)
    # host metadata
    C_key: np.ndarray     # (n,) reordered C values (sorted view order)
    T_key: np.ndarray     # (n,) reordered T values
    n: int
    db_tile: int
    # Optional bf16 SCAN plane (scan_store="bf16"): the dense selection
    # matmul reads this half-width copy; refinement keeps gathering the
    # exact fp32 Vp rows (models/device_db.py has the full rationale).
    V_scan: jnp.ndarray | None = None

    @property
    def n_pad(self) -> int:
        return self.Vp.shape[0]

    @property
    def num_tiles(self) -> int:
        return self.n_pad // self.db_tile

    @property
    def scan_V(self) -> jnp.ndarray:
        """The plane the selection scan reads (bf16 if present, else Vp)."""
        return self.V_scan if self.V_scan is not None else self.Vp


def _debug_phase(tag: str, t0: float) -> float:
    """HVQ_DEBUG_BUILD=1: stderr sub-phase timings for the index build."""
    import os
    import sys
    import time

    t1 = time.perf_counter()
    if os.environ.get("HVQ_DEBUG_BUILD") == "1":
        print(f"build[{tag}]: {t1 - t0:.1f}s", file=sys.stderr, flush=True)
    return t1


def _build_view(
    ds: Dataset,
    perm: np.ndarray,
    db_tile: int,
    dtype,
    row_multiple: int | None = None,
    V_dev: jnp.ndarray | None = None,
    scan_store: str = "fp32",
) -> SortedView:
    """``row_multiple``: pad rows to this multiple instead of ``db_tile``
    (mesh-sharded engines need every shard to hold whole tiles).

    ``V_dev``: optional pre-uploaded raw ``(n, dim)`` fp32 vector block in
    original row order, shared across views so the database crosses the
    relay once.

    The permutation gather, row/column padding, and norms all run ON
    DEVICE: an HBM gather moves the 4 GB block in ~10 ms where the host
    (one core, and on bad days a degraded one — r3 measured the host-side
    gather+pad alone at many minutes) was the build-phase bottleneck. The
    steps stay as separate dispatches so peak HBM is one extra block
    (~9 GB at D=10⁷), not a fused graph's worst case.
    """
    import time

    n = ds.n
    rm = row_multiple or db_tile
    if rm % db_tile:
        raise ValueError("row_multiple must be a multiple of db_tile")
    n_pad = -(-n // rm) * rm
    from hvq_tpu.utils.transfer import upload_rows

    t0 = time.perf_counter()
    own_V = V_dev is None
    if own_V:
        V_dev = upload_rows(np.asarray(ds.V, np.float32))
        V_dev.block_until_ready()
    t0 = _debug_phase("upload_raw", t0)
    # Row pad via one appended zero row every pad index points at; column
    # pad to the 128-lane width afterwards. d_norms in fp32 from the
    # stored block (for low-precision storage: computed BEFORE the cast so
    # they stay fp32-accurate).
    idx = jnp.asarray(
        np.concatenate(
            [perm.astype(np.int32), np.full(n_pad - n, n, np.int32)]
        )
    )
    # Chunked fill-mode gather, synced per chunk: TPU tiling pads the last
    # dim to 128 lanes, so every (·, 100) fp32 buffer physically occupies
    # the full 5.1 GB at D=10⁷ — a staged pad→take→pad chain keeps 3-4 of
    # them alive (allocator frees lag the Python `del`s) and
    # RESOURCE_EXHAUSTs the 16 GB chip (seen live, twice). Fill-mode take
    # needs no row-pad copy (out-of-range pad indices produce the zero
    # rows directly) and the per-chunk sync bounds the peak at source +
    # output ≈ 10.2 GB.
    pad_cols = _c.PADDED_DIM - ds.V.shape[1]
    bounds = np.linspace(0, n_pad, 9).astype(np.int64)
    outs = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        g = jnp.take(
            V_dev, idx[int(s):int(e)], axis=0, mode="fill", fill_value=0.0
        )
        g = jnp.pad(g, ((0, 0), (0, pad_cols)))
        g.block_until_ready()
        outs.append(g)
    if own_V:
        del V_dev
    Vp = jnp.concatenate(outs, axis=0)
    Vp.block_until_ready()
    del outs
    d_norms = jnp.sum(Vp * Vp, axis=1)
    if dtype not in (None, jnp.float32):
        Vp = Vp.astype(dtype)
    V_scan = None
    if scan_store == "bf16":
        if dtype not in (None, jnp.float32):
            raise ValueError(
                "scan_store='bf16' needs fp32 primary storage"
            )
        V_scan = Vp.astype(jnp.bfloat16)   # device-side round, +50% HBM
    elif scan_store != "fp32":
        raise ValueError(f"unknown scan_store {scan_store!r}")
    Vp.block_until_ready()
    t0 = _debug_phase("device_gather_pad", t0)

    def _pad(a, fill):
        out = np.full(n_pad, fill, dtype=a.dtype)
        out[:n] = a
        return out

    C_r = ds.C[perm]
    T_r = ds.T[perm]
    _debug_phase("host_keys", t0)
    return SortedView(
        Vp=Vp,
        C=jnp.asarray(_pad(C_r, np.float32(np.inf))),
        T=jnp.asarray(_pad(T_r, np.float32(np.inf))),
        d_norms=d_norms,
        oid=idx,                # original ids in view order; pad rows = n
        C_key=np.ascontiguousarray(C_r),
        T_key=np.ascontiguousarray(T_r),
        n=n,
        db_tile=db_tile,
        V_scan=V_scan,
    )


@dataclasses.dataclass
class PartitionedIndex:
    cat_view: SortedView
    T_sorted: np.ndarray                    # (n,) globally sorted T keys
    _time_view: SortedView | None = None
    _ds: Dataset | None = None              # lazy-build source
    _db_tile: int = 8192
    _dtype: object = None
    _row_multiple: int | None = None
    _scan_store: str = "fp32"

    @property
    def time_view(self) -> SortedView:
        """The T-sorted device view, built on first use.

        Only *narrow* type-2 queries ever touch it (wide ranges reroute to
        the cat view's dense scan), so eager construction would cost a
        second full database copy in HBM + upload for a path most workloads
        never take. Range WIDTHS are resolved from the host-side
        ``T_sorted`` keys without it.
        """
        if self._time_view is None:
            if self._ds is None:
                raise ValueError(
                    "time view not materialized and lazy source unavailable"
                )
            perm = np.argsort(self._ds.T, kind="stable").astype(np.int64)
            self._time_view = _build_view(
                self._ds, perm, self._db_tile, self._dtype or jnp.float32,
                row_multiple=self._row_multiple,
                scan_store=self._scan_store,
            )
        return self._time_view

    @classmethod
    def build(cls, ds: Dataset, db_tile: int = 8192, dtype=jnp.float32,
              lazy_time: bool = True, row_multiple: int | None = None,
              scan_store: str = "fp32"):
        import os
        import time

        _t0 = time.perf_counter()
        # HVQ_PERM_CACHE=<path.npz>: persist the host sort products (the
        # only non-upload build cost since the r3 on-device rework — the
        # 10⁷-row lexsort costs tens of seconds on a degraded host). The
        # bench keys this next to its dataset cache; the device arrays
        # must re-upload regardless (HBM doesn't survive the process).
        pc = os.environ.get("HVQ_PERM_CACHE")
        cat_perm = T_sorted = None
        if pc and os.path.exists(pc):
            z = np.load(pc, mmap_mode="r")
            if int(z["n"]) == ds.n:
                cat_perm = np.asarray(z["cat_perm"])
                T_sorted = np.asarray(z["T_sorted"])
        if cat_perm is None:
            cat_perm = np.lexsort((ds.T, ds.C)).astype(np.int64)  # C maj, T min
            T_sorted = np.sort(ds.T).astype(np.float32)
            if pc:
                tmp = f"{pc}.tmp{os.getpid()}"
                np.savez(tmp, n=ds.n, cat_perm=cat_perm, T_sorted=T_sorted)
                try:
                    os.replace(tmp + ".npz", pc)
                except OSError:
                    pass
        _debug_phase("lexsort", _t0)
        # Eager double-view builds share ONE raw upload (the database
        # crosses the ~40-60 MB/s relay once); the lazy path deliberately
        # does NOT retain the raw block — it would idle a full database
        # copy in HBM next to both views for a path most workloads never
        # take (ADVICE r3: the parameter previously had no call site).
        V_dev = None
        if not lazy_time:
            from hvq_tpu.utils.transfer import upload_rows

            V_dev = upload_rows(np.asarray(ds.V, np.float32))
            V_dev.block_until_ready()
        out = cls(
            cat_view=_build_view(
                ds, cat_perm, db_tile, dtype, row_multiple=row_multiple,
                V_dev=V_dev, scan_store=scan_store,
            ),
            T_sorted=T_sorted,
            _ds=ds,
            _db_tile=db_tile,
            _dtype=dtype,
            _row_multiple=row_multiple,
            _scan_store=scan_store,
        )
        if not lazy_time:
            time_perm = np.argsort(ds.T, kind="stable").astype(np.int64)
            out._time_view = _build_view(
                ds, time_perm, db_tile, dtype, row_multiple=row_multiple,
                V_dev=V_dev, scan_store=scan_store,
            )
            del V_dev
        return out

    # ---- host-side range resolution (binary search on sort keys) --------
    def query_ranges(
        self,
        qtype: np.ndarray,
        v: np.ndarray,
        l: np.ndarray,
        r: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per query: (view_id, start, end) — 0 = cat_view, 1 = time_view.

        The range is the exact candidate span in the chosen view; every row
        outside it is guaranteed to fail the predicate.
        """
        m = qtype.shape[0]
        view = np.where(qtype == 2, 1, 0).astype(np.int32)
        start = np.zeros(m, np.int64)
        end = np.full(m, self.cat_view.n, np.int64)

        cv = self.cat_view
        is1 = qtype == 1
        is2 = qtype == 2
        is3 = qtype == 3
        if is1.any() or is3.any():
            sel = is1 | is3
            s = np.searchsorted(cv.C_key, v[sel], side="left")
            e = np.searchsorted(cv.C_key, v[sel], side="right")
            start[sel], end[sel] = s, e
        if is3.any():
            # narrow each partition by its (sorted) timestamps — grouped by
            # category so the host cost is O(#distinct categories) batched
            # searchsorteds, not one Python call per query (measured: the
            # per-query loop was most of the 479 ms route phase at Q=4·10⁴)
            idx3 = np.nonzero(is3)[0]
            v3 = v[idx3]
            order = np.argsort(v3, kind="stable")
            sidx = idx3[order]
            vs = v3[order]
            b = np.r_[0, np.flatnonzero(np.diff(vs)) + 1, vs.size]
            for g0, g1 in zip(b[:-1], b[1:]):
                g = sidx[g0:g1]
                s, e = start[g[0]], end[g[0]]
                seg = cv.T_key[s:e]
                start[g] = s + np.searchsorted(seg, l[g], side="left")
                end[g] = s + np.searchsorted(seg, r[g], side="right")
        if is2.any():
            # resolved from host keys alone — does NOT materialize time_view
            start[is2] = np.searchsorted(self.T_sorted, l[is2], side="left")
            end[is2] = np.searchsorted(self.T_sorted, r[is2], side="right")
        return view, start, end


def tiles_for_ranges(
    start: np.ndarray, end: np.ndarray, db_tile: int, num_tiles: int
) -> np.ndarray:
    """Union of tile indices overlapping any [start, end) range, sorted.

    Empty ranges contribute nothing; callers handle all-empty batches (the
    result may be a zero-length array).
    """
    mask = np.zeros(num_tiles, dtype=bool)
    for s, e in zip(start, end):
        if e > s:
            mask[s // db_tile : (e - 1) // db_tile + 1] = True
    return np.nonzero(mask)[0].astype(np.int32)


def pad_tile_list(tiles: np.ndarray, bucket: int | None = None) -> np.ndarray:
    """Pad a tile list to a power-of-two bucket with -1 (skipped tiles).

    Bucketing bounds the number of distinct jit specializations to
    log2(num_tiles) per (view, batch-size) pair.
    """
    count = max(int(tiles.shape[0]), 1)
    size = bucket or (1 << (count - 1).bit_length())
    out = np.full(size, -1, np.int32)
    out[: tiles.shape[0]] = tiles
    return out
