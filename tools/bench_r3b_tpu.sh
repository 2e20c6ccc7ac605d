#!/bin/bash
# Round-3b TPU validation: headline bench sanity after the exact-eval +
# spatial-partitioning work, plus the cost of exact padded inference.
# Run with nothing else on the host (1 core: pytest contention inflates
# timings). Logs to /tmp/bench_r3b/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT=${1:-/tmp/bench_r3b}
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name: $*"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. Headline driver bench (fwd b16 + train b16 JSON) — regression check.
run fwd_train 7200 python bench.py

# 2. Exact padded inference cost on a val-shaped batch (the new default
#    eval path): exact vs plain forward_batch at (512, 683) pad (512, 704).
run exact_eval 5400 python tools/bench_exact_eval.py --batch 4 --iters 20
