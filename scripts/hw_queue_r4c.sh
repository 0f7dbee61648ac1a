#!/bin/bash
# Round-4 queue part C: write-path probe + flash block sweep + prefill.
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

run write_probe python scripts/kernel_write_probe.py
run flash_probe python scripts/kernel_flash_probe.py
run prefill_r4 python scripts/bench_prefill.py
run prefill_profile3 python scripts/bench_prefill_profile.py

echo "ALL DONE r4c"
