#!/bin/bash
# Round-4 queue part E: beam pool-write A/B (one session), flash numerics.
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

run flash_check2 python scripts/check_flash_tpu.py
# beam pool-write A/B, back-to-back (bf16 and int8 cache)
run beam_dus       env AUTOGPTQ_TPU_POOL_WRITE=dus     python scripts/bench_beam.py
run beam_scatter   env AUTOGPTQ_TPU_POOL_WRITE=scatter python scripts/bench_beam.py
run beam_dus_i8    env AUTOGPTQ_TPU_POOL_WRITE=dus     BENCH_KV_QUANT=1 python scripts/bench_beam.py
run beam_scat_i8   env AUTOGPTQ_TPU_POOL_WRITE=scatter BENCH_KV_QUANT=1 python scripts/bench_beam.py
# batch-8 after window + engine work (same-session reference point)
run batch8_r4e python scripts/bench_batch.py

echo "ALL DONE r4e"
