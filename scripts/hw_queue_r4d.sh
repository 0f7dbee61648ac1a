#!/bin/bash
# Round-4 queue part D: write-path variants + flash numerics + headline.
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

run write_probe2 python scripts/kernel_write_probe.py
run flash_check python scripts/check_flash_tpu.py
run bench_head2 python bench.py

echo "ALL DONE r4d"
