"""Tiled device k-means — the coarse quantizer for the IVF index.

Assignment is the same masked-matmul pattern as the search scan: a
``lax.scan`` over database tiles, each step scoring (Dt, k) centroid
distances on the MXU and arg-minning per row; sums/counts accumulate via
XLA scatter-add. The whole Lloyd iteration is one jitted function, so a full
k-means fit is ``iters`` device dispatches with no host round-trips of the
data. Index build never sees query vectors (reference README.md:68).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("db_tile",))
def _lloyd_iteration(Vt, valid_t, centroids, db_tile: int):
    """One Lloyd step. Vt: (nt, Dt, d); valid_t: (nt, Dt) row-valid mask.

    Returns (new_sums (k, d), counts (k,), cost scalar).
    """
    k, d = centroids.shape
    c_norms = jnp.sum(centroids * centroids, axis=1)

    def step(carry, xs):
        sums, counts, cost = carry
        V_tile, valid = xs
        scores = c_norms[None, :] - 2.0 * jax.lax.dot_general(
            V_tile, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )                                           # (Dt, k)
        assign = jnp.argmin(scores, axis=1)
        best = jnp.min(scores, axis=1)
        w = valid.astype(jnp.float32)
        sums = sums.at[assign].add(V_tile * w[:, None])
        counts = counts.at[assign].add(w)
        cost = cost + jnp.sum(jnp.where(valid, best, 0.0))
        return (sums, counts, cost), None

    init = (
        jnp.zeros((k, d), jnp.float32),
        jnp.zeros((k,), jnp.float32),
        jnp.float32(0.0),
    )
    (sums, counts, cost), _ = jax.lax.scan(step, init, (Vt, valid_t))
    return sums, counts, cost


@functools.partial(jax.jit, static_argnames=("db_tile",))
def assign_clusters(Vt, centroids, db_tile: int):
    """Final hard assignment: (nt, Dt) -> flat (nt*Dt,) cluster ids."""
    c_norms = jnp.sum(centroids * centroids, axis=1)

    def step(_, V_tile):
        scores = c_norms[None, :] - 2.0 * jax.lax.dot_general(
            V_tile, centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmin(scores, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(step, None, Vt)
    return assigns.reshape(-1)


def fit_kmeans(
    Vp: jnp.ndarray,       # (n_pad, d) device vectors (zero rows padded)
    n: int,                # true row count
    k: int,
    iters: int = 8,
    db_tile: int = 65536,
    seed: int = 0,
) -> tuple[jnp.ndarray, np.ndarray]:
    """Fit k centroids; returns (centroids (k, d), assignment (n,) host).

    Initialization: k distinct rows sampled uniformly (host RNG). Empty
    clusters keep their previous centroid (counts guard) — adequate for the
    coarse quantizer role where balance comes from the bucket cut, not the
    clustering itself.
    """
    n_pad, d = Vp.shape
    db_tile = min(db_tile, n_pad)
    if n_pad % db_tile:
        raise ValueError(f"n_pad {n_pad} not divisible by db_tile {db_tile}")
    nt = n_pad // db_tile
    Vt = Vp.reshape(nt, db_tile, d).astype(jnp.float32)
    lane = np.arange(n_pad).reshape(nt, db_tile)
    valid_t = jnp.asarray(lane < n)

    rng = np.random.default_rng(seed)
    init_rows = rng.choice(n, size=min(k, n), replace=False)
    centroids = jnp.asarray(np.asarray(Vp[jnp.asarray(init_rows)]))
    if k > n:  # degenerate tiny datasets
        centroids = jnp.concatenate(
            [centroids, jnp.zeros((k - n, d), jnp.float32)]
        )

    for _ in range(iters):
        sums, counts, _cost = _lloyd_iteration(Vt, valid_t, centroids, db_tile)
        safe = jnp.maximum(counts[:, None], 1.0)
        centroids = jnp.where(counts[:, None] > 0, sums / safe, centroids)

    assign = np.asarray(assign_clusters(Vt, centroids, db_tile))[:n]
    return centroids, assign
