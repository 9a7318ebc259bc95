"""IVF index: balanced bucketed coarse quantization (approximate mode).

The north-star capability beyond the reference (BASELINE.json config 4):
cluster the database, reorder it cluster-major, and cut the ordering into
fixed-capacity buckets so every probe is one contiguous, statically-shaped
block — the TPU-friendly form of an IVF inverted list (ragged lists would
force dynamic shapes; balanced buckets keep every gather and matmul static).

Bucket centroids are the means of the rows actually in each bucket (not the
k-means centroids), so probing ranks exactly the blocks that will be
scanned. Memory: one reordered database copy + (nb × 128) centroids ≈ the
reference's own footprint ("equal memory" constraint).

Build never sees query vectors (reference README.md:68).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.ops.distance import pad_vectors_np
from hvq_tpu.ops.kmeans import fit_kmeans
from hvq_tpu.utils.formats import Dataset


@dataclasses.dataclass
class IVFIndex:
    # device arrays (rows in cluster-major bucket order, padded to n_pad)
    Vp: jnp.ndarray          # (n_pad, 128)
    C: jnp.ndarray           # (n_pad,)
    T: jnp.ndarray           # (n_pad,)
    oid: jnp.ndarray         # (n_pad,) int32; padding rows hold n
    d_norms: jnp.ndarray     # (n_pad,) ‖d‖² (for the exact-scan fallback)
    centroids: jnp.ndarray   # (nb, 128) bucket means
    c_norms: jnp.ndarray     # (nb,)
    n: int
    cap: int
    scan_tile: int           # tile width of the exact-scan fallback
    # host-side selectivity statistics (built from attributes only)
    cat_vals: np.ndarray     # sorted unique C values
    cat_freq: np.ndarray     # fraction of rows per value
    t_sample: np.ndarray     # sorted T subsample (empirical CDF)

    @property
    def num_buckets(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_pad(self) -> int:
        return self.Vp.shape[0]

    # --- selectivity estimation (host) -----------------------------------
    def selectivity(
        self, qtype: np.ndarray, v: np.ndarray, l: np.ndarray, r: np.ndarray
    ) -> np.ndarray:
        """Estimated fraction of rows passing each query's predicate."""
        m = qtype.shape[0]
        sel = np.ones(m, np.float64)
        has_c = np.isin(qtype, (1, 3))
        if has_c.any():
            pos = np.searchsorted(self.cat_vals, v[has_c])
            pos = np.clip(pos, 0, max(self.cat_vals.size - 1, 0))
            hit = (
                self.cat_vals[pos] == v[has_c]
                if self.cat_vals.size
                else np.zeros(has_c.sum(), bool)
            )
            sel[has_c] = np.where(hit, self.cat_freq[pos], 0.0)
        has_t = np.isin(qtype, (2, 3))
        if has_t.any():
            lo = np.searchsorted(self.t_sample, l[has_t], side="left")
            hi = np.searchsorted(self.t_sample, r[has_t], side="right")
            sel[has_t] *= (hi - lo) / max(self.t_sample.size, 1)
        return sel

    @classmethod
    def build(
        cls,
        ds: Dataset,
        cap: int = 1024,
        n_clusters: int | None = None,
        iters: int = 8,
        seed: int = 0,
        kmeans_tile: int = 65536,
    ) -> "IVFIndex":
        """Cluster, then lay out **cluster-aligned** buckets.

        Every bucket holds rows of exactly one k-means cluster (clusters are
        padded up to a multiple of ``cap``), so bucket centroids are honest
        cluster summaries — a bucket spanning two clusters would sit between
        them and be mis-ranked by the probe, costing recall. The padding
        overhead is ≤ ``n_clusters·(cap−1)`` rows (≈50 % of ``cap`` per
        cluster in expectation); the default ``n_clusters = ceil(n/cap)``
        trades that memory for the cleanest neighborhood separation. Lower
        ``n_clusters`` for tighter memory at the cost of more probes.
        """
        n = ds.n
        k = n_clusters or max(1, -(-n // cap))
        Vp_host = pad_vectors_np(ds.V.astype(np.float32), _c.PADDED_DIM)
        # pad rows so the k-means scan tiles evenly
        km_tile = min(kmeans_tile, 1 << (max(n, 1) - 1).bit_length())
        n_km = -(-n // km_tile) * km_tile
        Vp_km = np.zeros((n_km, _c.PADDED_DIM), np.float32)
        Vp_km[:n] = Vp_host
        _, assign = fit_kmeans(
            jnp.asarray(Vp_km), n, k, iters=iters, db_tile=km_tile, seed=seed
        )

        # Cluster-aligned layout: cluster c gets ceil(count_c/cap) buckets.
        counts = np.bincount(assign, minlength=k)
        nbuckets_per = -(-counts // cap)               # 0 for empty clusters
        nb = int(nbuckets_per.sum())
        # pad total rows so the exact-scan fallback tiles evenly too
        scan_tile = max(cap, 8192) if n >= 8192 else cap
        n_pad = -(-(nb * cap) // scan_tile) * scan_tile
        cluster_row_start = np.concatenate(
            [[0], np.cumsum(nbuckets_per * cap)]
        )[:-1]                                          # dest start per cluster

        order = np.argsort(assign, kind="stable").astype(np.int64)
        src_cluster_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        within = np.arange(n) - src_cluster_start[assign[order]]
        dest = cluster_row_start[assign[order]] + within

        V_r = np.zeros((n_pad, _c.PADDED_DIM), np.float32)
        C_r = np.full(n_pad, np.inf, np.float32)
        T_r = np.full(n_pad, np.inf, np.float32)
        oid = np.full(n_pad, n, np.int32)
        V_r[dest] = Vp_host[order]
        C_r[dest] = ds.C[order]
        T_r[dest] = ds.T[order]
        oid[dest] = order.astype(np.int32)

        # bucket means over the real rows of each bucket
        valid = (oid < n).astype(np.float32)
        nbc = nb * cap
        sums = (V_r[:nbc] * valid[:nbc, None]).reshape(nb, cap, -1).sum(axis=1)
        bcounts = valid[:nbc].reshape(nb, cap).sum(axis=1)
        cents = sums / np.maximum(bcounts[:, None], 1.0)
        c_norms = np.einsum("bd,bd->b", cents, cents).astype(np.float32)
        d_norms = np.einsum("nd,nd->n", V_r, V_r).astype(np.float32)

        # attribute-only selectivity statistics (never touches vectors)
        cat_vals, cat_counts = np.unique(ds.C, return_counts=True)
        t_sample = np.sort(
            ds.T
            if n <= 65536
            else np.random.default_rng(0).choice(ds.T, 65536, replace=False)
        )

        return cls(
            Vp=jnp.asarray(V_r),
            C=jnp.asarray(C_r),
            T=jnp.asarray(T_r),
            oid=jnp.asarray(oid),
            d_norms=jnp.asarray(d_norms),
            centroids=jnp.asarray(cents.astype(np.float32)),
            c_norms=jnp.asarray(c_norms),
            n=n,
            cap=cap,
            scan_tile=scan_tile,
            cat_vals=cat_vals.astype(np.float32),
            cat_freq=(cat_counts / n).astype(np.float64),
            t_sample=t_sample.astype(np.float32),
        )
