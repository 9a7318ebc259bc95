"""Index checkpoint / resume.

The reference has no persistent artifacts beyond final results (SURVEY.md §5
"Checkpoint / resume — absent") because it has no indexing phase. This
framework does — k-means fits and sorted views are built once and reused —
so both index types serialize to a single ``.npz`` checkpoint: build cost is
paid once, restarts resume instantly, and a serving fleet can load one
prebuilt index everywhere.

The checkpoint stores host NumPy arrays (device placement happens on load),
a format-version tag, and the index hyperparameters.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from hvq_tpu.index.ivf import IVFIndex
from hvq_tpu.index.partition import PartitionedIndex, SortedView

_FORMAT_VERSION = 1


def save_partitioned(idx: PartitionedIndex, path: str | os.PathLike) -> None:
    arrays = {"__kind__": np.array("partitioned"),
              "__version__": np.array(_FORMAT_VERSION)}
    for name, view in (("cat", idx.cat_view), ("time", idx.time_view)):
        arrays.update(
            {
                f"{name}_Vp": np.asarray(view.Vp),
                f"{name}_C": np.asarray(view.C),
                f"{name}_T": np.asarray(view.T),
                f"{name}_d_norms": np.asarray(view.d_norms),
                f"{name}_oid": np.asarray(view.oid),
                f"{name}_C_key": view.C_key,
                f"{name}_T_key": view.T_key,
                f"{name}_meta": np.array([view.n, view.db_tile], np.int64),
            }
        )
    np.savez_compressed(os.fspath(path), **arrays)


def _load_view(z, name: str) -> SortedView:
    n, db_tile = (int(x) for x in z[f"{name}_meta"])
    return SortedView(
        Vp=jnp.asarray(z[f"{name}_Vp"]),
        C=jnp.asarray(z[f"{name}_C"]),
        T=jnp.asarray(z[f"{name}_T"]),
        d_norms=jnp.asarray(z[f"{name}_d_norms"]),
        oid=jnp.asarray(z[f"{name}_oid"]),
        C_key=z[f"{name}_C_key"],
        T_key=z[f"{name}_T_key"],
        n=n,
        db_tile=db_tile,
    )


def save_ivf(idx: IVFIndex, path: str | os.PathLike) -> None:
    np.savez_compressed(
        os.fspath(path),
        __kind__=np.array("ivf"),
        __version__=np.array(_FORMAT_VERSION),
        Vp=np.asarray(idx.Vp),
        C=np.asarray(idx.C),
        T=np.asarray(idx.T),
        oid=np.asarray(idx.oid),
        d_norms=np.asarray(idx.d_norms),
        centroids=np.asarray(idx.centroids),
        c_norms=np.asarray(idx.c_norms),
        meta=np.array([idx.n, idx.cap, idx.scan_tile], np.int64),
        cat_vals=idx.cat_vals,
        cat_freq=idx.cat_freq,
        t_sample=idx.t_sample,
    )


def load_index(path: str | os.PathLike):
    """Load any saved index; returns PartitionedIndex or IVFIndex."""
    z = np.load(os.fspath(path), allow_pickle=False)
    version = int(z["__version__"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported index checkpoint version {version}")
    kind = str(z["__kind__"])
    if kind == "partitioned":
        tv = _load_view(z, "time")
        return PartitionedIndex(
            cat_view=_load_view(z, "cat"),
            T_sorted=np.asarray(z["time_T_key"], np.float32),
            _time_view=tv,
        )
    if kind == "ivf":
        n, cap, scan_tile = (int(x) for x in z["meta"])
        return IVFIndex(
            Vp=jnp.asarray(z["Vp"]),
            C=jnp.asarray(z["C"]),
            T=jnp.asarray(z["T"]),
            oid=jnp.asarray(z["oid"]),
            d_norms=jnp.asarray(z["d_norms"]),
            centroids=jnp.asarray(z["centroids"]),
            c_norms=jnp.asarray(z["c_norms"]),
            n=n,
            cap=cap,
            scan_tile=scan_tile,
            cat_vals=z["cat_vals"],
            cat_freq=z["cat_freq"],
            t_sample=z["t_sample"],
        )
    raise ValueError(f"unknown index checkpoint kind {kind!r}")
