#!/bin/bash
# One-session headline table (VERDICT r2 #5): every README row re-measured
# with the CURRENT code into a single HVQ_BENCH_LOG file, so the published
# table stops mixing eras. Each row is one supervised bench.py config; the
# dataset caches in /dev/shm make repeats cheap.
#
# Usage: bash experiments/headline_table.sh [logfile]
set -u
LOG="${1:-/tmp/bench_log_r3.md}"
cd "$(dirname "$0")/.."
export HVQ_BENCH_LOG="$LOG"
export HVQ_BENCH_NO_FALLBACK=1

run() { # name env...
  local name="$1"; shift
  echo "=== $name ===" >&2
  env "$@" timeout 2400 python bench.py 2>&1 | grep -E '^\{"metric"' | tail -1
}

# large D=10^7 mixed, flagship (also produced by the default bench run)
run "large-mixed-partitioned" HVQ_BENCH_ENGINE=partitioned
# large type-0 only: the dense floor (no routing possible)
run "large-type0-batched" HVQ_BENCH_ENGINE=batched HVQ_BENCH_TYPES=0
# medium D=10^6 mixed
run "medium-mixed-partitioned" HVQ_BENCH_ENGINE=partitioned \
    HVQ_BENCH_N=1000000 HVQ_BENCH_Q=10000
# medium certified bf16 scan plane (batched: the engine that supports it)
run "medium-bf16-plane-batched" HVQ_BENCH_ENGINE=batched \
    HVQ_BENCH_N=1000000 HVQ_BENCH_Q=10000 HVQ_BENCH_STORE=bf16
# default D=10^4
run "default-batched" HVQ_BENCH_ENGINE=batched \
    HVQ_BENCH_N=10000 HVQ_BENCH_Q=10000
echo "--- table rows appended to $LOG ---" >&2
cat "$LOG" >&2
