#!/bin/bash
# Round-4 queue part G: beam + serving with the aliased page-write kernel.
set -u
mkdir -p /tmp/hw_r4
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/hw_r4/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -6 "/tmp/hw_r4/$name.log"
}

run beam_wk      python scripts/bench_beam.py
run beam_wk_i8   env BENCH_KV_QUANT=1 python scripts/bench_beam.py
run trace_beam2  python scripts/profile_beam_trace.py beam
run serving_wk   python scripts/bench_serving_engines.py

echo "ALL DONE r4g"
