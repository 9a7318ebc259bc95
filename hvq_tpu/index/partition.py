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

    @property
    def n_pad(self) -> int:
        return self.Vp.shape[0]

    @property
    def num_tiles(self) -> int:
        return self.n_pad // self.db_tile


def _build_view(
    ds: Dataset,
    perm: np.ndarray,
    db_tile: int,
    dtype,
    row_multiple: int | None = None,
) -> SortedView:
    """``row_multiple``: pad rows to this multiple instead of ``db_tile``
    (mesh-sharded engines need every shard to hold whole tiles)."""
    n = ds.n
    rm = row_multiple or db_tile
    if rm % db_tile:
        raise ValueError("row_multiple must be a multiple of db_tile")
    n_pad = -(-n // rm) * rm
    # ONE padded host buffer, filled in place (the earlier
    # reorder→pad→copy chain made three ~5 GB host copies at D=10⁷);
    # d_norms are computed ON DEVICE after the upload — one ~10 ms HBM
    # pass instead of host gigaflops (VERDICT r1 weak #7).
    Vfull = np.zeros((n_pad, _c.PADDED_DIM), np.float32)
    # A disk-backed memmap source turns the permuted gather into random
    # 400-byte disk reads (measured: >20 min cold at D=10⁷ on this image's
    # 36 MB/s disk — the r3 build-time regression). Materialize sequentially
    # first; a RAM-backed source (or /dev/shm mmap) passes through.
    V_src = np.array(ds.V) if isinstance(ds.V, np.memmap) else ds.V
    np.take(V_src, perm, axis=0, out=Vfull[:n, : ds.V.shape[1]])
    del V_src

    def _pad(a, fill):
        out = np.full(n_pad, fill, dtype=a.dtype)
        out[:n] = a
        return out

    C_r = ds.C[perm]
    T_r = ds.T[perm]
    from hvq_tpu.utils.transfer import upload_rows

    if dtype in (None, jnp.float32):
        Vp = upload_rows(Vfull)
        d_norms = jnp.sum(Vp * Vp, axis=1)
    else:
        # low-precision storage: norms must stay fp32-accurate, so they
        # are computed from the fp32 host buffer before the cast
        d_norms_h = np.einsum("nd,nd->n", Vfull, Vfull).astype(np.float32)
        Vp = upload_rows(Vfull, dtype=dtype)
        d_norms = jnp.asarray(d_norms_h)
    return SortedView(
        Vp=Vp,
        C=jnp.asarray(_pad(C_r, np.float32(np.inf))),
        T=jnp.asarray(_pad(T_r, np.float32(np.inf))),
        d_norms=d_norms,
        oid=jnp.asarray(
            np.concatenate(
                [perm.astype(np.int32), np.full(n_pad - n, n, np.int32)]
            )
        ),
        C_key=np.ascontiguousarray(C_r),
        T_key=np.ascontiguousarray(T_r),
        n=n,
        db_tile=db_tile,
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
            )
        return self._time_view

    @classmethod
    def build(cls, ds: Dataset, db_tile: int = 8192, dtype=jnp.float32,
              lazy_time: bool = True, row_multiple: int | None = None):
        cat_perm = np.lexsort((ds.T, ds.C)).astype(np.int64)  # C major, T minor
        out = cls(
            cat_view=_build_view(
                ds, cat_perm, db_tile, dtype, row_multiple=row_multiple
            ),
            T_sorted=np.sort(ds.T).astype(np.float32),
            _ds=ds,
            _db_tile=db_tile,
            _dtype=dtype,
            _row_multiple=row_multiple,
        )
        if not lazy_time:
            _ = out.time_view
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
