"""Runtime engine registry.

Replaces the reference's compile-time engine selection (``IMPL`` preprocessor
define, src/test.cpp:6-13, CMakeLists.txt:19-32) with runtime dispatch: JIT
specialization does for us what a recompile did for the reference.

Engine protocol::

    engine = get_engine(name)(dataset, **kwargs)
    ids, dists = engine.search(queries, k=100, sample_proportion=1.0)

``ids``: (m, k) uint32 neighbor ids ascending by distance.
``dists``: (m, k) float32 engine-internal exact distances (the written
``.dist`` file recomputes them from gathered vectors, as the reference driver
does — see utils.formats.save_knn_dist).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_engine(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


def _populate() -> None:
    # Imported lazily so `import hvq_tpu` stays cheap and works without jax
    # for pure-IO use cases.
    if _REGISTRY:
        return
    import importlib

    for name, mod, cls in [
        ("oracle", "hvq_tpu.models.oracle", "OracleEngine"),
        ("batched", "hvq_tpu.models.batched", "BatchedEngine"),
        ("sharded", "hvq_tpu.models.sharded", "ShardedEngine"),
        ("partitioned", "hvq_tpu.models.partitioned", "PartitionedEngine"),
        (
            "partitioned_sharded",
            "hvq_tpu.models.partitioned_sharded",
            "ShardedPartitionedEngine",
        ),
        ("ivf", "hvq_tpu.models.ivf", "IVFEngine"),
        ("paged", "hvq_tpu.models.paged", "PagedEngine"),
    ]:
        try:
            _REGISTRY[name] = getattr(importlib.import_module(mod), cls)
        except ImportError:  # engine not available in this build
            pass


def get_engine(name: str) -> Callable:
    _populate()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown engine {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available_engines() -> list[str]:
    _populate()
    return sorted(_REGISTRY)
