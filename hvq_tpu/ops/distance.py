"""Distance computation — the MXU replacement for the AVX2 kernel.

The reference computes one query-to-candidate distance at a time with an
8-wide AVX2 loop over the 100 dims (include/optimized_impl.h:54-170,
``dist_to_query``). The TPU-native inversion (SURVEY.md §7) batches queries
and tiles the database so the bulk of the work is a single

    scores = ‖d‖² − 2·Q·Dᵀ        (‖q‖² is per-query constant ⇒ irrelevant
                                    to top-k selection and omitted)

matmul on the MXU. Because the expansion loses a few bits to cancellation,
selection keeps a slack margin (k' > k candidates) and a cheap exact
refinement pass recomputes ``Σ(q−d)²`` directly in fp32 for the k' survivors
before the final top-k — preserving the reference's exactness contract
(src/compare_data.cpp:5, tolerance 0.002) without giving up MXU throughput.

Vectors are zero-padded from 100 to 128 columns so tiles land on the MXU's
128-lane grid; zero columns contribute nothing to either formula.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # fp32-faithful (multi-pass) MXU
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,  # bf16-ish passes — fast mode
}


def resolve_precision(name: str) -> jax.lax.Precision:
    return _PRECISIONS[name]


def pad_vectors_np(V: np.ndarray, width: int = _c.PADDED_DIM) -> np.ndarray:
    """Zero-pad vector columns to the lane-aligned width (host side)."""
    n, d = V.shape
    if d > width:
        raise ValueError(f"vector dim {d} exceeds padded width {width}")
    out = np.zeros((n, width), dtype=V.dtype)
    out[:, :d] = V
    return out


def squared_norms(Vp: jnp.ndarray) -> jnp.ndarray:
    """Per-row ‖d‖² in fp32 (the matmul expansion's additive term)."""
    Vf = Vp.astype(jnp.float32)
    return jnp.sum(Vf * Vf, axis=-1)


def tile_scores(
    qV: jnp.ndarray,          # (B, 128) query vectors, zero-padded
    V_tile: jnp.ndarray,      # (Dt, 128) database tile, zero-padded
    d_norms_tile: jnp.ndarray,  # (Dt,) fp32 ‖d‖²
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """(B, Dt) selection scores = ‖d‖² − 2·q·d. MXU does the q·d contraction."""
    qd = jax.lax.dot_general(
        qV,
        V_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return d_norms_tile[None, :] - 2.0 * qd


def exact_distances(
    qV: jnp.ndarray,      # (B, 128) fp32, zero-padded
    rows: jnp.ndarray,    # (B, K, 128) gathered candidate vectors
) -> jnp.ndarray:
    """Direct fp32 ``Σ(q−d)²`` — the refinement / .dist-faithful distance.

    Matches the reference's scalar ``calc_dist`` semantics (io.h:38-48): the
    two attribute dims never enter (they live outside the vector block here),
    and summation is a fixed deterministic tree over 128 lanes.
    """
    diff = rows.astype(jnp.float32) - qV[:, None, :].astype(jnp.float32)
    return jnp.sum(diff * diff, axis=-1)
