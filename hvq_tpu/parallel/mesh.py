"""Device-mesh helpers — the runtime the reference's ThreadPool becomes.

The reference parallelizes by statically splitting the database row range
across a pool of pthreads on shared memory (include/threading.hpp:116-121).
The TPU equivalent is a ``jax.sharding.Mesh`` with the database row axis
sharded over a ``"d"`` mesh axis; collectives over ICI replace the pool's
condition-variable barrier (threading.hpp:64-97).

A second optional ``"q"`` axis shards the *query batch* (pure data
parallelism over independent queries — a capability the reference lacks, it
processes queries strictly sequentially, optimized_parallel.hpp:91).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_db_shards: int | None = None,
    n_query_shards: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("q", "d") mesh. Defaults to all devices on the "d" axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_db_shards is None:
        n_db_shards = devices.size // n_query_shards
    if n_db_shards * n_query_shards != devices.size:
        raise ValueError(
            f"{devices.size} devices cannot form a "
            f"{n_query_shards}x{n_db_shards} (q, d) mesh"
        )
    return Mesh(
        devices.reshape(n_query_shards, n_db_shards), axis_names=("q", "d")
    )


def db_sharding(mesh: Mesh) -> NamedSharding:
    """Database rows sharded over "d", replicated over "q"."""
    return NamedSharding(mesh, P("d"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Query-batch rows sharded over "q", replicated over "d"."""
    return NamedSharding(mesh, P("q"))
