"""Failure-handling wrapper: retry and OOM-bisection semantics."""

import numpy as np
import pytest

from hvq_tpu.utils.generators import generate_queries
from hvq_tpu.utils.resilience import ResilientEngine


class FlakyEngine:
    """Fails the first `fail_n` calls with a transient error."""

    name = "flaky"

    def __init__(self, fail_n):
        self.fail_n = fail_n
        self.calls = 0

    def search(self, qs, k=100, sample_proportion=1.0):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise RuntimeError("UNAVAILABLE: tunnel hiccup")
        ids = np.tile(np.arange(k, dtype=np.uint32), (qs.m, 1))
        return ids, np.zeros((qs.m, k), np.float32)


class OOMOverEngine:
    """OOMs for batches above a size threshold."""

    name = "oomy"

    def __init__(self, limit):
        self.limit = limit
        self.batch_sizes = []

    def search(self, qs, k=100, sample_proportion=1.0):
        if qs.m > self.limit:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of HBM")
        self.batch_sizes.append(qs.m)
        # encode query identity so reassembly order is checkable
        ids = np.repeat(
            qs.qtype.astype(np.uint32)[:, None] * 0 + np.arange(qs.m, dtype=np.uint32)[:, None],
            k, axis=1,
        )
        return ids, qs.V[:, :1].repeat(k, axis=1).astype(np.float32)


def test_retries_transient():
    eng = FlakyEngine(fail_n=2)
    r = ResilientEngine(eng, max_retries=3, backoff_s=0.0)
    qs = generate_queries(4, seed=1)
    ids, d = r.search(qs)
    assert eng.calls == 3 and ids.shape == (4, 100)


def test_retries_exhausted_raises():
    eng = FlakyEngine(fail_n=10)
    r = ResilientEngine(eng, max_retries=2, backoff_s=0.0)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        r.search(generate_queries(2, seed=2))


def test_oom_bisection_preserves_order():
    eng = OOMOverEngine(limit=3)
    r = ResilientEngine(eng, backoff_s=0.0)
    qs = generate_queries(10, seed=3)
    ids, d = r.search(qs)
    assert ids.shape == (10, 100)
    assert max(eng.batch_sizes) <= 3
    # distances row i corresponds to query i (first vector component)
    np.testing.assert_allclose(d[:, 0], qs.V[:, 0])


def test_non_transient_raises_immediately():
    class Broken:
        name = "broken"

        def search(self, qs, k=100, sample_proportion=1.0):
            raise ValueError("shape mismatch")

    r = ResilientEngine(Broken(), backoff_s=0.0)
    with pytest.raises(ValueError):
        r.search(generate_queries(2, seed=4))
