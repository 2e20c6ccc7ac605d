#!/bin/bash
# Round-3 TPU validation sweep: run once the axon backend is reachable.
# Validates the sample-group K-block packing (DAT_TPU_M1PACK) shipped
# interpret-verified during the 2026-08-17 axon outage, then records the
# round's headline numbers. Each leg is independent; a failed leg does
# not block the rest. Logs to /tmp/bench_r3/.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT=${1:-/tmp/bench_r3}
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name: $*"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. Packed-vs-unpacked per-stage D-block (fwd then fwd+bwd), stages 1-3
#    (stage 0 is v3/wide — packing only affects v4 narrow stages).
for s in 1 2 3; do
  run "block_s${s}_packed"     1800 python tools/bench_block.py --stage "$s" --impl pallas
  run "block_s${s}_unpacked"   1800 env DAT_TPU_M1PACK=1 python tools/bench_block.py --stage "$s" --impl pallas
  run "block_s${s}_packed_g"   1800 python tools/bench_block.py --stage "$s" --impl pallas --grad
  run "block_s${s}_unpacked_g" 1800 env DAT_TPU_M1PACK=1 python tools/bench_block.py --stage "$s" --impl pallas --grad
done

# 2. Headline forward (b16) + train (b16) + classifier (b64).
run fwd_b16   3600 python bench.py
run train_b16 3600 python bench.py --train
run cls_b64   3600 python bench.py --cls

# 3. Model-level fwd with packing disabled (attribution).
run fwd_b16_unpacked 3600 env DAT_TPU_M1PACK=1 python bench.py

# 4. Train operating-point probe: does b32 beat the b16 47.0 img/s?
run train_b32 3600 python bench.py --train --batch 32

echo "done; logs in $OUT"
