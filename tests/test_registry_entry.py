"""Registry dispatch + driver entry points (CPU)."""

import numpy as np

import hvq_tpu
from hvq_tpu.models.registry import available_engines, get_engine


def test_available_engines():
    names = available_engines()
    assert {"oracle", "batched", "sharded", "partitioned", "ivf"} <= set(names)


def test_get_engine_unknown():
    import pytest

    with pytest.raises(KeyError, match="unknown engine"):
        get_engine("warp-drive")


def test_engine_protocol_uniform(small_ds, small_qs):
    """Every engine satisfies the search protocol with consistent shapes."""
    for name in ("oracle", "batched"):
        eng = get_engine(name)(small_ds)
        ids, dists = eng.search(small_qs, k=100)
        assert ids.shape == (small_qs.m, 100) and ids.dtype == np.uint32
        assert dists.shape == (small_qs.m, 100)
        assert np.all(np.diff(dists, axis=1) >= -1e-5)  # ascending


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ids, dists = out
    assert ids.shape[1] == hvq_tpu.K_DEFAULT


def test_graft_entry_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
