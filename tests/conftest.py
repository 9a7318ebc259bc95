"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; the sharding paths are validated
on a virtual 8-device CPU mesh exactly as SURVEY.md §7 prescribes. Must run
before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU backend and pins
# JAX_PLATFORMS=axon before conftest runs; the config update is what
# actually wins (the env var alone is overridden by the plugin).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hvq_tpu.utils.generators import generate_dataset, generate_queries  # noqa: E402


@pytest.fixture(scope="session")
def small_ds():
    """2k records with discretized C (20 levels) so C==v predicates match."""
    return generate_dataset(2000, seed=7, categories=20)


@pytest.fixture(scope="session")
def small_qs():
    return generate_queries(64, seed=11, categories=20)


@pytest.fixture(scope="session")
def oracle_small(small_ds, small_qs):
    from hvq_tpu.models.oracle import search_oracle

    return search_oracle(small_ds, small_qs)


def assert_results_match(ds, qs, ids, dists, oracle_ids, oracle_dists, tol=0.002):
    """The differential contract: recomputed distances within tolerance.

    Mirrors run.sh + compare.out: both engines' ids are turned into
    recomputed distances (the .dist quantity) and compared element-wise
    (src/compare_data.cpp:31-62).
    """
    from hvq_tpu.utils.compare import compare_distances
    from hvq_tpu.utils.formats import recompute_result_distances

    d_a = recompute_result_distances(ds, qs, np.asarray(ids, dtype=np.int64))
    d_b = recompute_result_distances(
        ds, qs, np.asarray(oracle_ids, dtype=np.int64)
    )
    res = compare_distances(d_a, d_b, tolerance=tol)
    assert res.ok, (
        f"distance contract violated: status={res.status} "
        f"max_abs_diff={res.max_abs_diff} exceeding={res.num_exceeding}"
    )
    # Engine-reported distances must agree with their own recomputation too.
    res2 = compare_distances(np.asarray(dists), d_a, tolerance=tol)
    assert res2.ok, f"engine-internal distances disagree: {res2}"
