"""Unit tests for the shared certificate-bundle helpers
(models.batched.bundle_ids / unbundle_ids / rerun_suspect_ladder)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hvq_tpu.models.batched import (
    bundle_ids,
    dispatch_plan,
    rerun_suspect_ladder,
    unbundle_ids,
)


@pytest.mark.parametrize(
    "mode,max_id,width",
    [("none", 1 << 30, 100), ("16", 0xFFFF, 50), ("24", 0xFFFFFF, 75)],
)
def test_bundle_round_trip(mode, max_id, width):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, max_id + 1, size=(7, 100), dtype=np.int64)
    suspect = rng.random(7) < 0.4
    b = np.asarray(
        bundle_ids(jnp.asarray(ids, jnp.int32), jnp.asarray(suspect), mode)
    )
    assert b.shape == (7, width + 1)
    out_ids, out_s = unbundle_ids(b, 100, mode)
    assert (out_ids.astype(np.uint32) == ids.astype(np.uint32)).all()
    assert (out_s == suspect).all()


@pytest.mark.parametrize("mode", ["16", "24"])
def test_bundle_nondivisible_k_never_packs(mode):
    ids = jnp.arange(33, dtype=jnp.int32).reshape(3, 11)
    b = np.asarray(bundle_ids(ids, jnp.zeros(3, bool), mode))
    assert b.shape == (3, 12)     # k=11 not divisible → unpacked
    out_ids, _ = unbundle_ids(b, 11, mode)
    assert (out_ids == np.asarray(ids)).all()


@pytest.mark.parametrize("mode,mask", [("16", 0xFFFF), ("24", 0xFFFFFF)])
def test_bundle_out_of_range_id_stays_local(mode, mask):
    """An id violating the < n_pad invariant must corrupt only itself —
    the field mask stops its high bits bleeding into neighbors' lanes."""
    ids = np.arange(100, dtype=np.int64).reshape(1, 100)
    ids[0, 1] = mask + 5                 # out of field range
    b = np.asarray(bundle_ids(jnp.asarray(ids, jnp.int32),
                              jnp.zeros(1, bool), mode))
    out_ids, _ = unbundle_ids(b, 100, mode)
    good = np.ones(100, bool)
    good[1] = False
    assert (out_ids[0][good] == ids[0][good]).all()
    assert out_ids[0, 1] == (mask + 5) & mask


def test_id_pack_mode_selection():
    from hvq_tpu.models.batched import id_pack_mode, packed_id_width

    assert id_pack_mode(10_000, 100) == "16"
    assert id_pack_mode(1_000_000, 100) == "24"
    assert id_pack_mode(10_000_000, 100) == "24"
    assert id_pack_mode(20_000_000, 100) == "none"
    assert packed_id_width(100, "16") == 50
    assert packed_id_width(100, "24") == 75
    assert packed_id_width(11, "24") == 11


def test_rerun_ladder_compacts_and_scatters():
    """31 scattered suspects over 4096 queries must cost exactly ONE
    deeper run in the SMALLEST pow-2 program shape (B=64), and results
    must scatter to the right rows."""
    B, k, kw = 1024, 4, 5
    m = 4096
    rng = np.random.default_rng(1)
    suspects = np.zeros(m, bool)
    flagged = rng.choice(m, size=31, replace=False)
    suspects[flagged] = True
    ids_raw = np.zeros((m, kw - 1), np.int32)
    dists_out = np.zeros((m, k), np.float32)
    calls = []

    def run(sel, impl, bin_top):
        calls.append((impl, bin_top, len(sel)))
        # deeper pass fixes every query: suspect column 0, ids = row index
        bundle = np.zeros((len(sel), kw), np.int32)
        bundle[:, : kw - 1] = sel[:, None].astype(np.int32)
        return jnp.asarray(bundle), jnp.full((len(sel), k), 7.0)

    rerun_suspect_ladder(
        suspects, ids_raw, dists_out, B, kw, k, deeper=6, run=run
    )
    assert calls == [("xla_packed", 6, 64)]      # one pow-2-compacted batch
    assert (ids_raw[flagged, 0] == flagged).all()
    assert (dists_out[flagged] == 7.0).all()
    untouched = ~suspects
    assert (ids_raw[untouched] == 0).all()


def test_rerun_ladder_escalates_still_suspect():
    B, k, kw = 8, 2, 3
    suspects = np.array([True] + [False] * 7)
    ids_raw = np.zeros((8, kw - 1), np.int32)
    calls = []

    def run(sel, impl, bin_top):
        calls.append(impl)
        bundle = np.zeros((len(sel), kw), np.int32)
        if impl == "xla_packed":
            bundle[:, -1] = 1                    # deeper pass still suspect
        else:
            bundle[:, : kw - 1] = 42
        return jnp.asarray(bundle), jnp.zeros((len(sel), k))

    rerun_suspect_ladder(
        suspects, ids_raw, None, B, kw, k, deeper=4, run=run
    )
    assert calls == ["xla_packed", "xla"]
    assert (ids_raw[0] == 42).all()


def test_dispatch_plan_shapes():
    assert dispatch_plan(10, 8) == [8, 2]
    assert dispatch_plan(3, 8) == [2, 1]
    assert dispatch_plan(5, 0) == [5]
    assert dispatch_plan(0, 8) == []
