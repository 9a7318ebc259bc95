"""End-to-end CLI tests (the run.sh differential flow), on CPU."""

import os
import subprocess
import sys

import numpy as np
import pytest

_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)


def run_cli(*argv, check=True):
    # --platform cpu makes the CLI itself force the CPU backend (the env
    # var alone is overridden by the image's axon plugin).
    return subprocess.run(
        [sys.executable, "-m", "hvq_tpu.cli", *argv],
        env=_ENV, capture_output=True, text=True, check=check, timeout=600,
    )


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    run_cli("gen-data", str(d / "data.bin"), "1500", "--categories", "30",
            "--seed", "5")
    run_cli("gen-queries", str(d / "query.bin"), "24", "--categories", "30",
            "--seed", "6")
    return d


def test_gen_files_have_contract_sizes(workdir):
    assert (workdir / "data.bin").stat().st_size == 4 + 1500 * 102 * 4
    assert (workdir / "query.bin").stat().st_size == 4 + 24 * 104 * 4


def test_run_and_compare_differential(workdir):
    for engine in ("oracle", "batched"):
        r = run_cli(
            "run", "--data", str(workdir / "data.bin"),
            "--queries", str(workdir / "query.bin"),
            "--engine", engine, "--platform", "cpu",
            "--db-tile", "256", "--query-batch", "8",
            "--output", str(workdir / f"{engine}.bin"),
        )
        assert "search:" in r.stderr
    out = run_cli(
        "compare", str(workdir / "oracle.bin"), str(workdir / "batched.bin")
    )
    assert "same" in out.stdout or "similar" in out.stdout

    # output.bin is headerless M*100 uint32
    assert (workdir / "batched.bin").stat().st_size == 24 * 100 * 4


def test_compare_detects_corruption(workdir):
    dist = workdir / "batched.bin.dist"
    raw = bytearray(dist.read_bytes())
    corrupted = workdir / "bad.dist"
    payload = np.frombuffer(bytes(raw[4:]), dtype=np.float32).copy()
    payload[7] += 5.0
    corrupted.write_bytes(raw[:4] + payload.tobytes())
    r = run_cli(
        "compare", str(workdir / "oracle.bin.dist"), str(corrupted),
        check=False,
    )
    assert r.returncode == 2
    assert "different" in r.stdout


def test_engine_opt_passthrough(workdir):
    r = run_cli(
        "run", "--data", str(workdir / "data.bin"),
        "--queries", str(workdir / "query.bin"),
        "--engine", "ivf", "--platform", "cpu",
        "--engine-opt", "cap=128", "--engine-opt", "nprobe=4",
        "--engine-opt", "kmeans_iters=2", "--query-batch", "8",
        "--output", str(workdir / "ivf.bin"),
    )
    assert "search:" in r.stderr
    # unknown opt warns but doesn't fail
    r2 = run_cli(
        "run", "--data", str(workdir / "data.bin"),
        "--queries", str(workdir / "query.bin"),
        "--engine", "oracle", "--platform", "cpu",
        "--engine-opt", "bogus=1",
        "--output", str(workdir / "o2.bin"),
    )
    assert "ignores" in r2.stderr


def test_build_index_and_run(workdir):
    idx_path = workdir / "part.npz"
    run_cli("build-index", "--data", str(workdir / "data.bin"),
            "--kind", "partitioned", "--out", str(idx_path),
            "--db-tile", "256", "--platform", "cpu")
    assert idx_path.exists()
    r = run_cli(
        "run", "--data", str(workdir / "data.bin"),
        "--queries", str(workdir / "query.bin"),
        "--engine", "partitioned", "--platform", "cpu",
        "--index", str(idx_path), "--db-tile", "256", "--query-batch", "8",
        "--output", str(workdir / "part.bin"),
    )
    assert "load_index" in r.stderr
    out = run_cli("compare", str(workdir / "oracle.bin"),
                  str(workdir / "part.bin"))
    assert "same" in out.stdout or "similar" in out.stdout


def test_run_with_profile_trace(workdir, tmp_path):
    trace_dir = tmp_path / "trace"
    r = run_cli(
        "run", "--data", str(workdir / "data.bin"),
        "--queries", str(workdir / "query.bin"),
        "--engine", "batched", "--platform", "cpu",
        "--db-tile", "256", "--query-batch", "8",
        "--profile", str(trace_dir),
        "--output", str(workdir / "prof.bin"),
    )
    assert "search:" in r.stderr
    assert any(trace_dir.rglob("*"))  # trace artifacts written


def test_run_sharded_engine(workdir):
    if not (workdir / "oracle.bin.dist").exists():
        run_cli("run", "--data", str(workdir / "data.bin"),
                "--queries", str(workdir / "query.bin"),
                "--engine", "oracle", "--platform", "cpu",
                "--output", str(workdir / "oracle.bin"))
    r = run_cli(
        "run", "--data", str(workdir / "data.bin"),
        "--queries", str(workdir / "query.bin"),
        "--engine", "sharded", "--platform", "cpu",
        "--db-tile", "64", "--query-batch", "8",
        "--output", str(workdir / "sharded.bin"),
    )
    assert "search:" in r.stderr
    out = run_cli("compare", str(workdir / "oracle.bin"),
                  str(workdir / "sharded.bin"))
    assert "same" in out.stdout or "similar" in out.stdout
