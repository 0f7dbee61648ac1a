#!/bin/bash
# Round-4 queue part B: re-measure after the scatter->dus fix and the
# multi-step serving blocks. ONE TPU process at a time.
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

# beam after the scatter fix (decomposition first, then e2e)
run beam_profile2 python scripts/bench_beam_profile.py 512
run beam_e2e2    python scripts/bench_beam.py
run beam_int8_2  env BENCH_KV_QUANT=1 python scripts/bench_beam.py
# serving engines after scatter fix + blocks
run serving_r4b python scripts/bench_serving_engines.py
# paged TPU smoke (real kernel + real pools on hardware)
run paged_smoke python scripts/smoke_paged_tpu.py

echo "ALL DONE r4b"
run beam_profile3 python scripts/bench_beam_profile.py 512
run decode_profile2 python scripts/bench_decode_profile.py
run prefill_profile2 python scripts/bench_prefill_profile.py
echo "PROFILES DONE"
run write_probe python scripts/kernel_write_probe.py
echo "WRITE PROBE DONE"
run flash_probe python scripts/kernel_flash_probe.py
run prefill_r4 python scripts/bench_prefill.py
run prefill_profile3 python scripts/bench_prefill_profile.py
echo "FLASH DONE"
