#!/bin/bash
# Round-3 hardware queue, part B: reprioritized remainder after the layout
# A/Bs (kb32 140.4 / ki32 137.1 / kb32l 141.3 tok/s). Highest-value first:
# manual kb32l pipeline (headline), beam, batch, widths, prefill, ckpt.
set -u
mkdir -p /tmp/hw_r3
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-2400}" "$@" > "/tmp/hw_r3/$name.log" 2>&1
  echo "--- exit $? ; tail:"
  tail -5 "/tmp/hw_r3/$name.log"
}

run smoke_kb32l_m python scripts/smoke_kb32l_manual.py
run bench_kb32l_m3 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=3 python bench.py
run bench_kb32l_m4 env BENCH_LAYOUT=kb32l AUTOGPTQ_TPU_KB32L_MANUAL=4 python bench.py
run beam_e2e    python scripts/bench_beam.py
run beam_int8   env BENCH_KV_QUANT=1 python scripts/bench_beam.py
run batch8 python scripts/bench_batch.py
run widths python scripts/bench_widths.py
run prefill python scripts/bench_prefill.py
run e2e_ckpt python scripts/bench_e2e_checkpoint.py 512 /tmp/bench_e2e_llama7b_gptq
run serving python scripts/bench_serving_engines.py
run solver python scripts/bench_solver.py
run moe python scripts/bench_moe.py
run bench_autotune env AUTOGPTQ_TPU_AUTOTUNE=1 python bench.py
run k3i32  python scripts/kernel_k3i32_probe.py
run dma_probe python scripts/kernel_dma_probe.py
run beam_profile python scripts/bench_beam_profile.py 512

echo "ALL DONE — logs in /tmp/hw_r3/"
