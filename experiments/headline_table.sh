#!/bin/bash
# One-session headline table (VERDICT r2 #5; refreshed each round): every
# README row re-measured with the CURRENT code into a single HVQ_BENCH_LOG
# file, so the published table stops mixing eras. Each row is one
# supervised bench.py config (median-of-3 timed searches, 64-query oracle
# check); the dataset + perm caches in /dev/shm make repeats cheap.
#
# The HEADLINE rows (flagship, medium, default) additionally carry the
# r5 full-population differential (every query's .dist row cross-checked
# against an independent engine, VERDICT r4 #1); the A/B partner rows skip
# it (HVQ_BENCH_FULLDIFF=0) — their job is the in-session delta, and the
# partner engine run would double their session cost.
#
# Usage: bash experiments/headline_table.sh [logfile]
set -u
LOG="${1:-/tmp/bench_log_r5.md}"
cd "$(dirname "$0")/.."
export HVQ_BENCH_LOG="$LOG"
export HVQ_BENCH_NO_FALLBACK=1

run() { # name env...
  local name="$1"; shift
  echo "=== $name ===" >&2
  # full per-row output (incl. stderr: phase timers, full_diff failures)
  # preserved — a grep-only pipe once swallowed the one line that said
  # why the flagship full_diff leg failed
  env "$@" timeout 2400 python bench.py > "/tmp/ht_row_${name}.log" 2>&1
  grep -E '^\{"metric"' "/tmp/ht_row_${name}.log" | tail -1
}

# large D=10^7 mixed, flagship (bf16 scan plane is the >=4M-row default)
run "large-mixed-partitioned" HVQ_BENCH_ENGINE=partitioned
# large mixed, fp32 selection plane (the bf16-plane A/B partner)
run "large-mixed-partitioned-fp32" HVQ_BENCH_ENGINE=partitioned \
    HVQ_BENCH_STORE=fp32 HVQ_BENCH_FULLDIFF=0
# large mixed on the mesh path (1 real device; multi-chip covered by dryrun)
run "large-mixed-partitioned-sharded" HVQ_BENCH_ENGINE=partitioned_sharded \
    HVQ_BENCH_FULLDIFF=0
# large type-0 only: the dense floor (no routing possible)
run "large-type0-batched" HVQ_BENCH_ENGINE=batched HVQ_BENCH_TYPES=0 \
    HVQ_BENCH_FULLDIFF=0
# medium D=10^6 mixed
run "medium-mixed-partitioned" HVQ_BENCH_ENGINE=partitioned \
    HVQ_BENCH_N=1000000 HVQ_BENCH_Q=10000
# medium dense engine (type-mixed, fp32: the plane loses below ~4M rows)
run "medium-mixed-batched" HVQ_BENCH_ENGINE=batched \
    HVQ_BENCH_N=1000000 HVQ_BENCH_Q=10000 HVQ_BENCH_FULLDIFF=0
# medium certified bf16 scan plane (batched A/B partner)
run "medium-bf16-plane-batched" HVQ_BENCH_ENGINE=batched \
    HVQ_BENCH_N=1000000 HVQ_BENCH_Q=10000 HVQ_BENCH_STORE=bf16 \
    HVQ_BENCH_FULLDIFF=0
# default D=10^4
run "default-batched" HVQ_BENCH_ENGINE=batched \
    HVQ_BENCH_N=10000 HVQ_BENCH_Q=10000
echo "--- table rows appended to $LOG ---" >&2
cat "$LOG" >&2
