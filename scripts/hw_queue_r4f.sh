#!/bin/bash
# Round-4 queue part F: device trace of beam + batch8, auto-policy beam
# confirmation, fixed flash numerics check.
set -u
mkdir -p /tmp/hw_r4
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/hw_r4/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -8 "/tmp/hw_r4/$name.log"
}

run trace_beam python scripts/profile_beam_trace.py beam
run trace_batch8 python scripts/profile_beam_trace.py batch8
run beam_auto python scripts/bench_beam.py
run beam_auto_i8 env BENCH_KV_QUANT=1 python scripts/bench_beam.py
run flash_check3 python scripts/check_flash_tpu.py

echo "ALL DONE r4f"
