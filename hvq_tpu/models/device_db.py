"""Device-resident database layout.

The reference keeps the database as a ``vector<vector<float>>`` of 102-float
row records (io.h:111-136) and re-reads attributes and vector from the same
cache lines per candidate. On TPU the layout is split column-wise and
lane-aligned once at load time:

* ``Vp``   (n_pad, 128)  — vectors zero-padded from 100 to 128 lanes,
* ``C``    (n_pad,)      — categorical attribute,
* ``T``    (n_pad,)      — timestamp attribute,
* ``d_norms`` (n_pad,)   — precomputed ‖d‖² for the matmul expansion,

with rows padded to a multiple of the database tile so a ``lax.scan`` over
``(num_tiles, Dt, ·)`` reshapes needs no remainder handling (padding rows are
masked out by the ``gid < sn`` term of the predicate mask).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from hvq_tpu import constants as _c
from hvq_tpu.utils.formats import Dataset


@dataclasses.dataclass
class DeviceDB:
    Vp: jnp.ndarray        # (n_pad, 128) vectors (dtype = storage dtype)
    C: jnp.ndarray         # (n_pad,) float32
    T: jnp.ndarray         # (n_pad,) float32
    d_norms: jnp.ndarray   # (n_pad,) float32
    n: int                 # true row count
    db_tile: int
    # Optional bf16 SCAN plane (``scan_store="bf16"``): the selection matmul
    # reads this half-width copy (one true-bf16 MXU pass instead of the
    # 3-pass fp32-faithful decomposition, half the database bytes) while
    # refinement keeps gathering the exact fp32 ``Vp`` rows — the 0.002
    # distance contract never sees the bf16 rounding. The certificate stays
    # on with the wider ``_CERT_REL_MM_BF16`` slack (models.batched).
    V_scan: Optional[jnp.ndarray] = None

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

    @classmethod
    def from_dataset(
        cls,
        ds: Dataset,
        db_tile: int = 8192,
        dtype: jnp.dtype = jnp.float32,
        row_multiple: Optional[int] = None,
        scan_store: str = "fp32",
    ) -> "DeviceDB":
        """Upload a host Dataset, lane-padding columns and tile-padding rows.

        ``row_multiple`` (default ``db_tile``) also serves the sharded engine,
        which needs rows divisible by ``num_devices * db_tile``.

        ``scan_store="bf16"`` additionally keeps a rounded bf16 copy for the
        selection scan (+50% HBM; requires ``dtype=float32``).
        """
        mult = row_multiple or db_tile
        n = ds.n
        n_pad = -(-n // mult) * mult
        # ONE padded host buffer, filled in place (at 10⁷ rows the old
        # pad-then-concatenate chain allocated and copied the ~5 GB block
        # twice before the upload even started).
        Vp_host = np.zeros((n_pad, _c.PADDED_DIM), np.float32)
        Vp_host[:n, : ds.V.shape[1]] = ds.V
        C = np.zeros(n_pad, np.float32)
        C[:n] = ds.C
        T = np.zeros(n_pad, np.float32)
        T[:n] = ds.T
        from hvq_tpu.utils.transfer import upload_rows

        Vp_dev = upload_rows(Vp_host, dtype=dtype)
        # ‖d‖² on DEVICE from the uploaded block: skips the host einsum
        # over the 5 GB buffer and the extra 40 MB relay upload. For
        # low-precision storage this also automatically describes the
        # *stored* (rounded) vectors, as the expansion requires.
        d_norms = jnp.sum(Vp_dev.astype(jnp.float32) ** 2, axis=1)
        V_scan = None
        if scan_store == "bf16":
            if dtype != jnp.float32:
                raise ValueError(
                    "scan_store='bf16' needs fp32 primary storage (the "
                    "bf16 fast mode already scans its own storage)"
                )
            V_scan = Vp_dev.astype(jnp.bfloat16)   # device-side round
        elif scan_store != "fp32":
            raise ValueError(f"unknown scan_store {scan_store!r}")
        return cls(
            Vp=Vp_dev,
            C=jnp.asarray(C),
            T=jnp.asarray(T),
            d_norms=d_norms,
            n=n,
            db_tile=db_tile,
            V_scan=V_scan,
        )

    def tiles(self):
        """Reshaped (num_tiles, Dt, ·) views for lax.scan consumption."""
        nt, Dt = self.num_tiles, self.db_tile
        return (
            self.Vp.reshape(nt, Dt, self.Vp.shape[-1]),
            self.C.reshape(nt, Dt),
            self.T.reshape(nt, Dt),
            self.d_norms.reshape(nt, Dt),
        )
