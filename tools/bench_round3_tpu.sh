#!/bin/bash
# Round-3 TPU validation sweep: run once the axon backend is reachable.
# Validates the sample-group K-block packing (DAT_TPU_M1PACK) shipped
# interpret-verified during the 2026-08-17 axon outage, then records the
# round's headline numbers. Legs are ordered by importance (headline
# first) in case the backend window is short; each leg is independent
# and a failed leg does not block the rest. Logs to /tmp/bench_r3/.
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

# 1. Headline numbers (the driver's bench legs): fwd+train combined JSON,
#    then the classifier.
run fwd_train_b16 7200 python bench.py
run cls_b64       3600 python bench.py --cls

# 2. Packing attribution at model level (fwd, packing disabled).
run fwd_b16_unpacked 3600 env DAT_TPU_M1PACK=1 python bench.py --fwd-only

# 3. Train operating-point probe: does b32 beat the b16 47.0 img/s?
run train_b32 3600 python bench.py --train --batch 32

# 4. Packed-vs-unpacked per-stage D-block (fwd then fwd+bwd), stages 1-3
#    (stage 0 is v3/wide — packing only affects v4 narrow stages).
for s in 1 2 3; do
  run "block_s${s}_packed"     1800 python tools/bench_block.py --stage "$s" --impl pallas
  run "block_s${s}_unpacked"   1800 env DAT_TPU_M1PACK=1 python tools/bench_block.py --stage "$s" --impl pallas
  run "block_s${s}_packed_g"   1800 python tools/bench_block.py --stage "$s" --impl pallas --grad
  run "block_s${s}_unpacked_g" 1800 env DAT_TPU_M1PACK=1 python tools/bench_block.py --stage "$s" --impl pallas --grad
done

echo "done; logs in $OUT"
