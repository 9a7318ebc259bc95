"""Command-line drivers — runtime config replacing the reference's
compile-time preprocessor selection (SURVEY.md §5 "Config / flag system").

Subcommands:

* ``run``       — the src/test.cpp:20-112 analogue: read D and Q, run an
                  engine with perf instrumentation, write ``output.bin``
                  (headerless ids) and ``output.bin.dist`` (recomputed
                  distances). Engine/dataset/k/threads were compile-time
                  defines there (``IMPL``, ``DATASET``, ``NUM_THREADS``);
                  here they are flags, since JIT specialization replaces
                  preprocessor specialization.
* ``compare``   — the src/compare_data.cpp:80-108 analogue: pairwise
                  element-wise diff of ``<path>.dist`` files under the 0.002
                  tolerance; optional recall against the last file.
* ``gen-data``  — src/write_data.c analogue (vectorized).
* ``gen-queries`` — src/write_query.c analogue.

Exit codes: 0 = ok/similar, 1 = usage error, 2 = comparison found
differences beyond tolerance.
"""

from __future__ import annotations

import argparse
import sys
import time


def _print_counters(rep: dict, m: int, wall: float) -> None:
    """Counter table for the timed search region, per-query normalized —
    the reference's BenchmarkParameters dump (perfevent.hpp:260-320:
    one aligned header/value row pair on stderr)."""
    cols = [("wall_s", f"{wall:.3f}")]
    for name in ("cycles", "instructions", "L1d_misses", "LLC_misses",
                 "branch_misses"):
        if name in rep:
            cols.append((f"{name}/q", f"{rep[name] / max(m, 1):.1f}"))
    for name in ("IPC", "GHz"):
        if name in rep:
            cols.append((name, f"{rep[name]:.3f}"))
    widths = [max(len(h), len(v)) for h, v in cols]
    print(
        " ".join(h.rjust(w) for (h, _), w in zip(cols, widths)),
        file=sys.stderr,
    )
    print(
        " ".join(v.rjust(w) for (_, v), w in zip(cols, widths)),
        file=sys.stderr,
    )


def _cmd_run(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)

    from hvq_tpu.models.registry import get_engine
    from hvq_tpu.utils import formats
    from hvq_tpu.utils.timing import PhaseTimer

    # Overlap backend/device initialization (expensive through remote
    # attachments — measured minutes via this environment's relay) with
    # the host-side file reads.
    import threading

    def _warm_device():
        try:
            import jax.numpy as jnp

            float(jnp.sum(jnp.ones(8)))
        except Exception:
            pass

    init_t = threading.Thread(target=_warm_device, daemon=True)
    init_t.start()

    timer = PhaseTimer()
    with timer.phase("read_data"):
        ds = formats.read_data_bin(args.data)
        qs = formats.read_query_bin(args.queries)
    init_t.join()
    print(f"# data points:  {ds.n}", file=sys.stderr)
    print(f"# queries:      {qs.m}", file=sys.stderr)

    import inspect

    engine_cls = get_engine(args.engine)
    accepted = inspect.signature(engine_cls.__init__).parameters
    kwargs = {
        k: v
        for k, v in dict(
            db_tile=args.db_tile,
            query_batch=args.query_batch,
            precision=args.precision,
        ).items()
        if k in accepted and v is not None
    }
    for opt in args.engine_opt or ():
        key, _, val = opt.partition("=")
        if key not in accepted:
            print(f"warning: {args.engine} ignores --engine-opt {key}",
                  file=sys.stderr)
            continue
        try:
            kwargs[key] = int(val)
        except ValueError:
            try:
                kwargs[key] = float(val)
            except ValueError:
                kwargs[key] = val
    if args.index:
        from hvq_tpu.index.serialize import load_index

        with timer.phase("load_index"):
            kwargs["index"] = load_index(args.index)
    with timer.phase("build_engine"):
        engine = engine_cls(ds, **kwargs)
    if args.resilient:
        from hvq_tpu.utils.resilience import ResilientEngine

        engine = ResilientEngine(engine)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    # Timed region = ids only, mirroring the reference: vec_query returns
    # ids (optimized_impl.h:392-437); the .dist file is recomputed from ids
    # after the counters stop (src/test.cpp:95-110, io.h:50-78). Host HW
    # counters bracket the search exactly as the reference's PerfEvent
    # brackets vec_query (src/test.cpp:82-92, perfevent.hpp:112-198).
    from hvq_tpu.native import PerfCounters

    search_params = inspect.signature(
        getattr(engine, "engine", engine).search
    ).parameters
    search_kw = {}
    if "return_dists" in search_params:
        search_kw["return_dists"] = False
    if "phases" in search_params:
        search_kw["phases"] = timer
    t0 = time.perf_counter()
    with PerfCounters() as pc:
        ids, _ = engine.search(
            qs, k=args.k, sample_proportion=args.sample_proportion,
            **search_kw,
        )
    wall = time.perf_counter() - t0
    if args.profile:
        jax.profiler.stop_trace()
    timer.add("search", wall)
    if pc.values:
        _print_counters(pc.report(), qs.m, wall)

    with timer.phase("write_results"):
        formats.save_knn(ids, args.output)
        if args.save_dist:
            formats.save_knn_dist(ds, qs, ids, args.output + ".dist")
    timer.report()
    print(
        f"search: {wall:.3f} s  ({qs.m / wall:.1f} QPS, "
        f"{wall / qs.m * 1e3:.3f} ms/query)",
        file=sys.stderr,
    )
    return 0


def _cmd_compare(args) -> int:
    from hvq_tpu.utils import formats
    from hvq_tpu.utils.compare import compare_distances

    import numpy as np

    paths = [p if p.endswith(".dist") else p + ".dist" for p in args.files]
    worst = "same"
    rank = {"same": 0, "similar": 1, "different": 2}
    for i in range(len(paths)):
        for j in range(i + 1, len(paths)):
            a = formats.read_dist(paths[i])
            b = formats.read_dist(paths[j])
            res = compare_distances(a, b, tolerance=args.tolerance)
            print(
                f"{paths[i]} vs {paths[j]}: {res.status} "
                f"(max |Δ| = {res.max_abs_diff:.6g}, "
                f"{res.num_exceeding}/{res.total} beyond {args.tolerance})"
            )
            if res.status == "different" and args.show_diffs:
                # print the first offending entries, as compare.out does
                # (reference src/compare_data.cpp:44-58 prints up to 50)
                bad = np.argwhere(np.abs(a - b) > args.tolerance)
                for qi, ki in bad[: args.show_diffs]:
                    print(
                        f"  query {qi} rank {ki}: "
                        f"{a[qi, ki]:.6f} vs {b[qi, ki]:.6f} "
                        f"(Δ = {a[qi, ki] - b[qi, ki]:+.6f})"
                    )
            if rank[res.status] > rank[worst]:
                worst = res.status
    return 2 if worst == "different" else 0


def _cmd_build_index(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from hvq_tpu.utils import formats
    from hvq_tpu.utils.timing import PhaseTimer

    timer = PhaseTimer()
    with timer.phase("read_data"):
        ds = formats.read_data_bin(args.data)
    with timer.phase("build"):
        if args.kind == "partitioned":
            from hvq_tpu.index.partition import PartitionedIndex
            from hvq_tpu.index.serialize import save_partitioned

            idx = PartitionedIndex.build(ds, db_tile=args.db_tile)
            save_partitioned(idx, args.out)
        elif args.kind == "ivf":
            from hvq_tpu.index.ivf import IVFIndex
            from hvq_tpu.index.serialize import save_ivf

            idx = IVFIndex.build(
                ds, cap=args.cap, iters=args.kmeans_iters, seed=args.seed
            )
            save_ivf(idx, args.out)
        else:
            raise SystemExit(f"unknown index kind {args.kind}")
    timer.report()
    print(f"wrote {args.kind} index to {args.out}", file=sys.stderr)
    return 0


def _cmd_gen_data(args) -> int:
    from hvq_tpu.utils import formats
    from hvq_tpu.utils.generators import generate_dataset

    ds = generate_dataset(args.n, seed=args.seed, categories=args.categories)
    formats.write_data_bin(args.path, ds)
    print(f"wrote {args.n} records to {args.path}", file=sys.stderr)
    return 0


def _cmd_gen_queries(args) -> int:
    from hvq_tpu.utils import formats
    from hvq_tpu.utils.generators import generate_queries

    qs = generate_queries(args.m, seed=args.seed, categories=args.categories)
    formats.write_query_bin(args.path, qs)
    print(f"wrote {args.m} queries to {args.path}", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hvq_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run hybrid k-NN queries (test.cpp analogue)")
    r.add_argument("--data", required=True)
    r.add_argument("--queries", required=True)
    r.add_argument("--output", default="output.bin")
    r.add_argument("--engine", default="batched")
    r.add_argument("--k", type=int, default=100)
    r.add_argument("--sample-proportion", type=float, default=1.0)
    # None → the engine's own (measured-best) default; an explicit value
    # overrides. A fixed CLI default here would silently undercut the
    # engines (e.g. query_batch 256 vs the measured-best 1024, DESIGN.md).
    r.add_argument("--db-tile", type=int, default=None)
    r.add_argument("--query-batch", type=int, default=None)
    r.add_argument("--precision", default=None,
                   choices=("highest", "high", "default"))
    r.add_argument("--engine-opt", action="append", metavar="KEY=VALUE",
                   help="extra engine kwargs (e.g. nprobe=32, cap=512)")
    r.add_argument("--resilient", action="store_true",
                   help="wrap the engine with retry + OOM-bisection")
    r.add_argument("--index", help="prebuilt index checkpoint (.npz) to load")
    r.add_argument("--save-dist", action=argparse.BooleanOptionalAction,
                   default=True, help="also write <output>.dist")
    r.add_argument("--profile", metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    r.add_argument("--platform", help="force a JAX platform (e.g. cpu)")
    r.add_argument("--cache-dir", help="persistent XLA compilation cache")
    r.set_defaults(fn=_cmd_run)

    c = sub.add_parser("compare",
                       help="pairwise-diff .dist files (compare_data.cpp analogue)")
    c.add_argument("files", nargs="+")
    c.add_argument("--tolerance", type=float, default=0.002)
    c.add_argument("--show-diffs", type=int, default=50, metavar="N",
                   help="print up to N offending entries (0 = none)")
    c.set_defaults(fn=_cmd_compare)

    bi = sub.add_parser("build-index",
                        help="build + checkpoint an index (partitioned/ivf)")
    bi.add_argument("--data", required=True)
    bi.add_argument("--kind", required=True, choices=("partitioned", "ivf"))
    bi.add_argument("--out", required=True)
    bi.add_argument("--db-tile", type=int, default=8192)
    bi.add_argument("--cap", type=int, default=1024)
    bi.add_argument("--kmeans-iters", type=int, default=8)
    bi.add_argument("--seed", type=int, default=0)
    bi.add_argument("--platform", help="force a JAX platform (e.g. cpu)")
    bi.set_defaults(fn=_cmd_build_index)

    gd = sub.add_parser("gen-data", help="synthetic dataset (write_data.c analogue)")
    gd.add_argument("path")
    gd.add_argument("n", type=int)
    gd.add_argument("--seed", type=int, default=0)
    gd.add_argument("--categories", type=int, default=None)
    gd.set_defaults(fn=_cmd_gen_data)

    gq = sub.add_parser("gen-queries", help="synthetic queries (write_query.c analogue)")
    gq.add_argument("path")
    gq.add_argument("m", type=int)
    gq.add_argument("--seed", type=int, default=1)
    gq.add_argument("--categories", type=int, default=None)
    gq.set_defaults(fn=_cmd_gen_queries)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
