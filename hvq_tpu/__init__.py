"""hvq_tpu — TPU-native hybrid vector search framework.

A brand-new JAX / XLA / Pallas framework with the capabilities of the C++/AVX2
reference ``atalantus/Project---Hybrid-Vector-Search-Queries``: exact (and
optionally approximate) k-nearest-neighbor search (k=100) over 100-dim float32
vectors under squared Euclidean distance, where each query may carry a
categorical equality predicate ``C == v`` and/or a timestamp range predicate
``l <= T <= r`` (reference README.md:24-53).

Instead of the reference's query-at-a-time AVX2 scan with a thread pool
(include/optimized_parallel.hpp), this framework:

* batches queries and tiles the database so distances become
  ``‖d‖² − 2·Q·Dᵀ`` matmuls on the MXU,
* fuses the attribute predicates into the distance tiles as masks,
* streams a running top-k across database tiles with ``lax.scan``,
* exactly re-refines the selected candidates in fp32,
* shards the database row axis across a TPU mesh with an all-gather top-k
  merge (the ``ThreadPool``/``Knn::merge`` analogue,
  reference include/threading.hpp:64-97, include/optimized_impl.h:337-385),
* adds a category-partitioned / timestamp-sorted index layer and an IVF
  approximate mode the reference lacks.

Package layout::

    hvq_tpu/
      models/    engines: oracle, batched exact, sharded, IVF approximate
      ops/       distance tiles, predicate masks, top-k primitives, Pallas kernels
      parallel/  device mesh helpers + cross-device top-k merge collectives
      utils/     binary formats, generators, comparator, timing, profiling
      cli/       drivers (test.cpp / compare_data.cpp / write_*.c analogues)
      native/    C++ host runtime (mmap IO, perf counters) with Python fallback
"""

__version__ = "0.1.0"

from hvq_tpu.constants import (  # noqa: E402,F401
    K_DEFAULT,
    VEC_DIM,
    DATA_RECORD_DIM,
    QUERY_RECORD_DIM,
    DIST_TOLERANCE,
)

from hvq_tpu.utils.formats import (  # noqa: E402,F401
    Dataset,
    QuerySet,
    read_data_bin,
    read_query_bin,
    save_knn,
    save_knn_dist,
    read_knn,
    read_dist,
)
from hvq_tpu.models.registry import get_engine, available_engines  # noqa: E402,F401
