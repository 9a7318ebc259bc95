"""Binary format round-trip tests against hand-framed golden bytes (io.h)."""

import struct

import numpy as np

from hvq_tpu.utils import formats
from hvq_tpu.utils.generators import generate_dataset, generate_queries


def test_data_roundtrip(tmp_path):
    ds = generate_dataset(17, seed=3)
    p = tmp_path / "d.bin"
    formats.write_data_bin(p, ds)
    back = formats.read_data_bin(p)
    np.testing.assert_array_equal(back.C, ds.C)
    np.testing.assert_array_equal(back.T, ds.T)
    np.testing.assert_array_equal(back.V, ds.V)


def test_data_framing_matches_reference(tmp_path):
    """Byte layout: uint32 N then N×102 float32 records (io.h:111-136)."""
    ds = generate_dataset(3, seed=1)
    p = tmp_path / "d.bin"
    formats.write_data_bin(p, ds)
    raw = p.read_bytes()
    assert len(raw) == 4 + 3 * 102 * 4
    (n,) = struct.unpack("<I", raw[:4])
    assert n == 3
    rec0 = np.frombuffer(raw[4 : 4 + 102 * 4], dtype="<f4")
    assert rec0[0] == ds.C[0] and rec0[1] == ds.T[0]
    np.testing.assert_array_equal(rec0[2:], ds.V[0])


def test_query_roundtrip(tmp_path):
    qs = generate_queries(9, seed=5)
    p = tmp_path / "q.bin"
    formats.write_query_bin(p, qs)
    back = formats.read_query_bin(p)
    np.testing.assert_array_equal(back.qtype, qs.qtype)
    np.testing.assert_array_equal(back.v, qs.v)
    np.testing.assert_array_equal(back.l, qs.l)
    np.testing.assert_array_equal(back.r, qs.r)
    np.testing.assert_array_equal(back.V, qs.V)


def test_output_headerless(tmp_path):
    """SaveKNN writes M×100 uint32 with no header (io.h:23-36)."""
    ids = np.arange(200, dtype=np.uint32).reshape(2, 100)
    p = tmp_path / "output.bin"
    formats.save_knn(ids, p)
    assert p.stat().st_size == 2 * 100 * 4  # exactly the payload, no header
    np.testing.assert_array_equal(formats.read_knn(p), ids)


def test_dist_file_header_and_recompute(tmp_path):
    """.dist carries a uint32 M header + recomputed distances (io.h:50-78)."""
    ds = generate_dataset(150, seed=2)
    qs = generate_queries(2, seed=4)
    ids = np.stack([np.arange(100, dtype=np.uint32)] * 2)
    p = tmp_path / "output.bin.dist"
    d = formats.save_knn_dist(ds, qs, ids, p)
    assert p.stat().st_size == 4 + 2 * 100 * 4
    back = formats.read_dist(p)
    np.testing.assert_array_equal(back, d)
    # Spot-check one value against a scalar calc_dist (io.h:38-48).
    expect = float(((ds.V[5] - qs.V[1]) ** 2).sum())
    assert abs(back[1, 5] - expect) < 1e-3
