#!/usr/bin/env bash
# Differential run harness — the reference run.sh analogue: run the oracle
# and ALL optimized engines on the same D/Q, then pairwise-compare the
# .dist files under the 0.002 tolerance (reference run.sh:8-18). The exact
# engines (batched, sharded, partitioned) must come back "same"/"similar";
# ivf is approximate by design, so it gets a recall line against the
# oracle instead of strict .dist equality.
#
# Usage: ./run.sh [N] [M] [workdir]
set -euo pipefail

N="${1:-10000}"
M="${2:-100}"
DIR="${3:-./run_out}"
mkdir -p "$DIR/logs"

# PLATFORM=cpu ./run.sh ...  forces the CPU backend (e.g. for CI boxes);
# unset, engines run on the default (TPU) backend.
PLATFORM_FLAG=()
if [[ -n "${PLATFORM:-}" ]]; then
  PLATFORM_FLAG=(--platform "$PLATFORM")
fi

echo "== generating D=$N Q=$M (discretized C) =="
python -m hvq_tpu.cli gen-data "$DIR/data.bin" "$N" --categories 100
python -m hvq_tpu.cli gen-queries "$DIR/query.bin" "$M" --categories 100

# ALL 7 shipped engines pass through the differential driver (reference
# run.sh:9-18 runs every engine it ships). paged gets a small window so the
# host-paging path runs >=2 windows even at D=10^4; partitioned_sharded
# runs on whatever devices the host exposes (1-device mesh is valid).
for ENGINE in oracle batched sharded partitioned partitioned_sharded paged ivf; do
  EXTRA=()
  if [[ "$ENGINE" == "paged" ]]; then
    EXTRA=(--engine-opt "window_rows=$(( N / 2 < 4096 ? 4096 : N / 2 ))")
  fi
  echo "== engine: $ENGINE =="
  python -m hvq_tpu.cli run \
    --data "$DIR/data.bin" --queries "$DIR/query.bin" \
    --engine "$ENGINE" --output "$DIR/$ENGINE.bin" \
    --cache-dir /tmp/jax_bench_cache "${PLATFORM_FLAG[@]}" "${EXTRA[@]}" \
    > "$DIR/logs/$ENGINE.txt" 2>&1 || { tail -5 "$DIR/logs/$ENGINE.txt"; exit 1; }
  tail -2 "$DIR/logs/$ENGINE.txt"
done

echo "== differential comparison (exact engines) =="
python -m hvq_tpu.cli compare \
  "$DIR/oracle.bin" "$DIR/batched.bin" "$DIR/sharded.bin" \
  "$DIR/partitioned.bin" "$DIR/partitioned_sharded.bin" "$DIR/paged.bin"

echo "== ivf recall vs oracle =="
python - "$DIR" <<'EOF'
import sys

import numpy as np

from hvq_tpu.utils import formats
from hvq_tpu.utils.compare import recall_at_k

d = sys.argv[1]
oracle = formats.read_knn(f"{d}/oracle.bin")
ivf = formats.read_knn(f"{d}/ivf.bin")
od = formats.read_dist(f"{d}/oracle.bin.dist")
ivd = formats.read_dist(f"{d}/ivf.bin.dist")
rec = recall_at_k(ivf, oracle, ivd, od)
print(f"ivf recall@100 vs oracle: {rec:.4f}")
sys.exit(0 if rec >= 0.99 else 2)
EOF
